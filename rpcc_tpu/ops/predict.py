"""Intra-prediction of the range image from segmentation + model table.

Replaces ``segment_utils_cpp.intra_predict`` (``cpp_modules.cpp:248-285``):
per pixel, gather the model row of its cluster; if the normal sums to zero it
is a point model (constant depth ``d``), else intersect the pixel's scan ray
with the plane: ``r = -d / (a*A + b*B + c*C)``.  One fused gather + select.
"""

from __future__ import annotations

import jax.numpy as jnp


def intra_predict(
    seg_flat: jnp.ndarray,  # (..., HW) int32 cluster ids
    model_param: jnp.ndarray,  # (num_models, 4)
    transform_flat: jnp.ndarray,  # (HW, 3) unit rays
) -> jnp.ndarray:
    """Predicted range, flat (..., HW) float32."""
    par = model_param[seg_flat]  # (..., HW, 4)
    # The C++ point-model test is an exact float comparison a+b+c == 0
    # (cpp_modules.cpp:271); point models are written as exact zeros.
    is_point = (par[..., 0] + par[..., 1] + par[..., 2]) == 0.0
    denom = jnp.sum(par[..., :3] * transform_flat, axis=-1)
    r_plane = -par[..., 3] / denom
    return jnp.where(is_point, par[..., 3], r_plane)
