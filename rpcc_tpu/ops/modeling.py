"""Per-cluster modeling: point (mean range) and plane (RANSAC) models.

Point modeling replaces the C++ ``segment_utils_cpp.point_modeling``
(``cpp_modules.cpp:471-518``) with one ``segment_sum`` — per-cluster mean
range with ids 0 (ground) and 1 (zero pixels) forced to 0.  Model layout is
the codec's (num_models, 4) table: ``[0, 0, 0, mean_range]`` for point
models, ``[a, b, c, d]`` for planes (``utils/segment_utils.py:177-181``).

Plane modeling replaces the per-cluster python loop + unseeded o3d RANSAC
(``utils/segment_utils.py:187-216``): every cluster is fitted *in parallel*
from a fixed-size random sample of its pixels, gathered through the
cluster-sorted permutation (contiguous ranges per cluster), with the
reference's fallbacks — clusters under 30 pixels or planes too oblique to the
scan rays keep the point model (``:203-204,212-216``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from rpcc_tpu.ops.ransac import fit_plane_weighted, point_plane_distance_planar

MIN_PLANE_POINTS = 30  # utils/segment_utils.py:203
CLUSTER_RANSAC_N = 4  # :208
CLUSTER_RANSAC_ITERS = 10  # :209
CLUSTER_RANSAC_THRESHOLD = 0.1  # o3d default used at :75-82
PLANE_SAMPLE_CAPACITY = 1024  # fixed per-cluster sample for fitting/validation


def point_model_table(means: jnp.ndarray, num_models: int) -> jnp.ndarray:
    """(M,) per-cluster mean ranges -> (M, 4) [0,0,0,mean] model table."""
    zeros3 = jnp.zeros((num_models, 3), means.dtype)
    return jnp.concatenate([zeros3, means[:, None]], axis=-1)


def plane_models_stream(
    pc_planes_flat: jnp.ndarray,  # (3, HW) planar x/y/z, pixel order
    ri_s: jnp.ndarray,  # (HW,) range in stream order
    tm_planes_flat: jnp.ndarray,  # (3, HW) planar rays, pixel order
    order,  # StreamOrder
    key: jax.Array,
    num_models: int,
    angle_threshold_deg: float,
) -> jnp.ndarray:
    """Per-cluster RANSAC planes sampled through the stream permutation.

    Same semantics as :func:`plane_models` but fed by ops/stream.py state:
    each cluster's fixed random pixel sample is drawn from its contiguous
    stream range, so the only gathers are (M, S)-sized.
    """
    from rpcc_tpu.ops.stream import point_means_stream

    k_samp, k_hyp = jax.random.split(key)
    counts = order.counts
    cnt = jnp.maximum(counts, 1)[:, None]
    u = jax.random.uniform(k_samp, (num_models, PLANE_SAMPLE_CAPACITY))
    offs = jnp.minimum((u * cnt).astype(jnp.int32), cnt - 1)
    samp_pix = order.perm[order.starts[:, None] + offs]  # (M, S) small gather
    sx = pc_planes_flat[0][samp_pix]
    sy = pc_planes_flat[1][samp_pix]
    sz = pc_planes_flat[2][samp_pix]
    rx = tm_planes_flat[0][samp_pix]
    ry = tm_planes_flat[1][samp_pix]
    rz = tm_planes_flat[2][samp_pix]
    s_valid = (
        jnp.arange(PLANE_SAMPLE_CAPACITY)[None, :]
        < jnp.minimum(counts, PLANE_SAMPLE_CAPACITY)[:, None]
    )

    def fit_one(px, py, pz, valid, k):
        nv = jnp.maximum(jnp.sum(valid.astype(jnp.int32)), 1)
        uu = jax.random.uniform(k, (CLUSTER_RANSAC_ITERS, CLUSTER_RANSAC_N))
        hyp_idx = jnp.minimum((uu * nv).astype(jnp.int32), nv - 1)
        hyp_pts = jnp.stack([px[hyp_idx], py[hyp_idx], pz[hyp_idx]], axis=-1)
        ones = jnp.ones((CLUSTER_RANSAC_N,), px.dtype)
        planes = jax.vmap(lambda p: fit_plane_weighted(p, ones))(hyp_pts)
        dists = point_plane_distance_planar(px, py, pz, planes)  # (T, S)
        inl = (dists < CLUSTER_RANSAC_THRESHOLD) & valid[None, :]
        cnts = jnp.sum(inl.astype(jnp.int32), axis=-1)
        best = jnp.argmax(cnts)
        w = inl[best].astype(px.dtype)
        refit = fit_plane_weighted(jnp.stack([px, py, pz], axis=-1), w)
        return jnp.where(cnts[best] >= 3, refit, planes[best])

    keys = jax.random.split(k_hyp, num_models)
    planes = jax.vmap(fit_one)(sx, sy, sz, s_valid, keys)  # (M, 4)

    cosang = jnp.abs(planes[:, 0:1] * rx + planes[:, 1:2] * ry + planes[:, 2:3] * rz)
    cosang = cosang / jnp.maximum(jnp.linalg.norm(planes[:, :3], axis=-1), 1e-12)[:, None]
    alpha = jnp.arccos(jnp.clip(cosang, -1.0, 1.0))
    alpha = jnp.where(s_valid, alpha, 0.0)
    angle_ok = jnp.max(alpha, axis=-1) <= jnp.pi * (angle_threshold_deg / 180.0)

    pmod = point_model_table(point_means_stream(ri_s, order), num_models)
    use_plane = angle_ok & (counts >= MIN_PLANE_POINTS)
    use_plane = use_plane.at[0].set(False).at[1].set(False)
    return jnp.where(use_plane[:, None], planes, pmod)
