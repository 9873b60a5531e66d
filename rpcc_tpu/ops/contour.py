"""Lossless contour coding of the segmentation map — on device.

The reference encodes the seg map as a 1-bit-per-pixel "new run starts here"
mask plus the run values (``contour_utils_cpp.extract_contour``,
``cpp_modules.cpp:521-558``): contour=1 at column 0 of every row and wherever
the id differs from the left neighbor; the id value is emitted at each
contour=1 position in row-major order.

TPU formulation: the contour mask is a shifted compare; the index sequence is
a cumsum-compaction scatter; and the decoder's run-length fill
(``cpp_modules.cpp:561-593``) is ``seq[cumsum(contour) - 1]`` — a purely
parallel segmented broadcast instead of a serial pointer walk.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class ContourCode(NamedTuple):
    contour: jnp.ndarray  # (H, W) int32 {0, 1}
    sequence: jnp.ndarray  # (HW,) int32, first ``seq_len`` entries valid
    seq_len: jnp.ndarray  # () int32


def extract_contour(seg: jnp.ndarray) -> ContourCode:
    H, W = seg.shape
    left = jnp.concatenate([jnp.full((H, 1), -1, seg.dtype), seg[:, :-1]], axis=1)
    contour = (seg != left).astype(jnp.int32)
    contour = contour.at[:, 0].set(1)  # row starts are always contour points
    cflat = contour.reshape(-1)
    sflat = seg.reshape(-1).astype(jnp.int32)
    cum = jnp.cumsum(cflat)
    seq_len = cum[-1]
    dest = jnp.where(cflat == 1, cum - 1, cflat.shape[0])
    sequence = jnp.zeros((cflat.shape[0],), jnp.int32).at[dest].set(sflat, mode="drop")
    return ContourCode(contour, sequence, seq_len)


def recover_map(contour: jnp.ndarray, sequence: jnp.ndarray) -> jnp.ndarray:
    """Invert :func:`extract_contour`.  ``sequence`` may be tail-padded."""
    H, W = contour.shape
    cum = jnp.cumsum(contour.reshape(-1).astype(jnp.int32))
    run_id = jnp.maximum(cum - 1, 0)
    return sequence[run_id].reshape(H, W)
