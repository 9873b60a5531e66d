"""Intra-prediction of the range image from segmentation + model table.

Replaces ``segment_utils_cpp.intra_predict`` (``cpp_modules.cpp:248-285``):
per pixel, gather the model row of its cluster; if the normal sums to zero it
is a point model (constant depth ``d``), else intersect the pixel's scan ray
with the plane: ``r = -d / (a*A + b*B + c*C)``.

The per-pixel model parameters are gathered as four independent (HW,) scalar
gathers from (M,) columns — gathering (HW, 4) rows would tile-pad 4 -> 128
lanes on TPU and cost ~32x the bandwidth.
"""

from __future__ import annotations

import jax.numpy as jnp


def intra_predict(
    seg_flat: jnp.ndarray,  # (..., HW) int32 cluster ids
    model_param: jnp.ndarray,  # (num_models, 4)
    tm_planes_flat: jnp.ndarray,  # (3, HW) planar unit rays
) -> jnp.ndarray:
    """Predicted range, flat (..., HW) float32."""
    a = model_param[:, 0][seg_flat]
    b = model_param[:, 1][seg_flat]
    c = model_param[:, 2][seg_flat]
    d = model_param[:, 3][seg_flat]
    # The C++ point-model test is an exact float comparison a+b+c == 0
    # (cpp_modules.cpp:271); point models are written as exact zeros.
    is_point = (a + b + c) == 0.0
    denom = a * tm_planes_flat[0] + b * tm_planes_flat[1] + c * tm_planes_flat[2]
    r_plane = -d / denom
    return jnp.where(is_point, d, r_plane)
