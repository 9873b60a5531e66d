"""Rounding helpers.

The reference's hot paths run through C++ ``round()`` — round-half-away-from-
zero (projection binning ``cpp_modules.cpp:451,454`` and residual quantization
``cpp_modules.cpp:315,419``).  ``jnp.round`` is round-half-even, so we provide
the C-compatible version; pixel binning and quantized values must agree with
it for bitstream parity.
"""

import jax.numpy as jnp


def round_half_away(x: jnp.ndarray) -> jnp.ndarray:
    """Round half away from zero, like C ``round()`` / ``std::round``."""
    return jnp.trunc(x + jnp.where(x >= 0, 0.5, -0.5))
