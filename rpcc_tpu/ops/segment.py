"""Ground + cluster segmentation of a range image.

TPU-native re-design of ``PointCloudSegment.segment``
(``utils/segment_utils.py:95-170``):

  * ground plane: z < -1.5 filter, random <=5000 subsample, seeded RANSAC
    (reference ``:101-108`` uses unseeded o3d);
  * FPS cluster centers over the zero-masked non-ground pixel grid — the
    reference's default GPU-path semantics (``:139-141``), which is already
    the fixed-shape formulation a TPU wants;
  * per-pixel assignment: argmin over |ground depth residual| and Euclidean
    distances to the K centers (``:127-131``).  The (HW, K) distance block is
    computed as ``|p|^2 + |c|^2 - 2 p@c^T`` so the inner product rides the
    MXU;
  * relabel to the codec's id convention: 0=ground, 1=zero pixels,
    2..K+1=clusters (``:168-169``).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from rpcc_tpu.ops.fps import furthest_point_sample
from rpcc_tpu.ops.ransac import (
    compact_random_subset,
    point_plane_distance,
    ransac_plane,
)

GROUND_Z_CUT = -1.5  # utils/segment_utils.py:101
GROUND_FIT_CAPACITY = 5000  # :102-104
GROUND_FIT_MIN = 800  # :105-106
GROUND_RANSAC_THRESHOLD = 0.1  # :75
GROUND_RANSAC_N = 10  # :75
GROUND_RANSAC_ITERS = 100  # :75


class SegmentResult(NamedTuple):
    seg_idx: jnp.ndarray  # (H, W) int32: 0 ground, 1 zero pixels, 2.. clusters
    ground_model: jnp.ndarray  # (4,) normalized plane
    centers: jnp.ndarray  # (K, 3) FPS cluster centers


def fit_ground_plane(points_flat: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
    """Seeded RANSAC ground plane from low-z points (fallback: all points)."""
    k_sub, k_ransac = jax.random.split(key)
    low = points_flat[:, 2] < GROUND_Z_CUT
    n_low = jnp.sum(low.astype(jnp.int32))
    # Reference: if fewer than 800 candidates, fit on the full cloud (:105-106).
    mask = jnp.where(n_low < GROUND_FIT_MIN, jnp.ones_like(low), low)
    subset, count = compact_random_subset(points_flat, mask, k_sub, GROUND_FIT_CAPACITY)
    return ransac_plane(
        subset,
        count,
        k_ransac,
        threshold=GROUND_RANSAC_THRESHOLD,
        ransac_n=GROUND_RANSAC_N,
        num_hypotheses=GROUND_RANSAC_ITERS,
    )


def ground_depth_residual(
    range_image: jnp.ndarray, plane: jnp.ndarray, transform_map: jnp.ndarray
) -> jnp.ndarray:
    """Signed depth residual r - r_plane with r_plane = -d / (n . ray).

    Mirrors ``calc_plane_residual_depth`` (``utils/segment_utils.py:54-72``).
    Shapes: range_image (..., H, W), transform_map (H, W, 3) -> (..., H, W).
    """
    denom = jnp.sum(plane[:3] * transform_map, axis=-1)
    r_plane = -plane[3] / denom
    return range_image - r_plane


def segment_range_image_dbscan(
    point_cloud: jnp.ndarray,  # (H, W, 3)
    range_image: jnp.ndarray,  # (H, W)
    transform_map: jnp.ndarray,  # (H, W, 3)
    key: jax.Array,
    eps: float,
    max_clusters: int,
) -> SegmentResult:
    """DBSCAN-mode segmentation (``utils/segment_utils.py:149-164``): ground
    by |depth residual| <= 0.5, clusters from device connected components.

    Final ids: 0 ground, 1 zero pixels, 2 noise, 3.. clusters."""
    from rpcc_tpu.ops.dbscan import dbscan_range_image

    H, W = range_image.shape
    pts = point_cloud.reshape(-1, 3)
    ground_model = fit_ground_plane(pts, key)
    g_res = ground_depth_residual(range_image, ground_model, transform_map)
    nonzero = range_image > 0.0
    active = (jnp.abs(g_res) > 0.5) & nonzero  # :155-156
    seg = dbscan_range_image(point_cloud, active, eps, max_clusters)
    seg = jnp.where(nonzero, seg, 1)
    seg = jnp.where(nonzero & ~active, 0, seg)
    centers = jnp.zeros((max_clusters, 3), point_cloud.dtype)
    return SegmentResult(seg.astype(jnp.int32), ground_model, centers)


def segment_range_image(
    point_cloud: jnp.ndarray,  # (H, W, 3)
    range_image: jnp.ndarray,  # (H, W)
    transform_map: jnp.ndarray,  # (H, W, 3)
    key: jax.Array,
    ground_threshold: float,
    cluster_num: int,
) -> SegmentResult:
    H, W = range_image.shape
    pts = point_cloud.reshape(-1, 3)
    ri = range_image.reshape(-1)

    ground_model = fit_ground_plane(pts, key)

    # Non-ground mask by vertical (point-to-plane) distance (:119-120,137-138).
    vert = point_plane_distance(pts, ground_model)
    nonground = (vert > ground_threshold) & (ri > 0.0)
    ng_pts = pts * nonground[:, None].astype(pts.dtype)

    center_idx = furthest_point_sample(ng_pts, cluster_num)
    centers = ng_pts[center_idx]  # (K, 3)

    # Distance stack: column 0 = |ground depth residual|, 1..K = |p - c|.
    g_res = jnp.abs(
        ground_depth_residual(range_image, ground_model, transform_map).reshape(-1)
    )
    p2 = jnp.sum(pts * pts, axis=-1)  # (HW,)
    c2 = jnp.sum(centers * centers, axis=-1)  # (K,)
    pc = pts @ centers.T  # (HW, K) — MXU
    d2 = jnp.maximum(p2[:, None] + c2[None, :] - 2.0 * pc, 0.0)
    cdist = jnp.sqrt(d2)

    dist = jnp.concatenate([g_res[:, None], cdist], axis=1)  # (HW, K+1)
    seg = jnp.argmin(dist, axis=1).astype(jnp.int32)  # ties -> lowest id, like np.argmax of negation
    seg = jnp.where(seg > 0, seg + 1, seg)  # make room for zero-pixel class 1
    seg = jnp.where(ri == 0.0, 1, seg)
    return SegmentResult(seg.reshape(H, W), ground_model, centers)
