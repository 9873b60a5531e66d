"""Seeded, fully vectorized RANSAC plane fitting.

Replaces open3d's ``segment_plane`` (used at ``utils/segment_utils.py:75-82``
for the ground plane with ``threshold=0.1, ransac_n=10, num_iterations=100``
and at ``:207-209`` per cluster with ``ransac_n=4, num_iterations=10``).

The o3d implementation draws hypotheses *sequentially* and is unseeded, which
makes the reference encoder nondeterministic run-to-run (SURVEY.md §5 pitfall
7).  Here all hypotheses are drawn at once from a counter-based PRNG and
evaluated as one batched computation:

  sample (T, n) indices -> gather (T, n, 3) -> weighted-LSQ plane per
  hypothesis (3x3 eigh on the covariance) -> inlier counts via one planar
  (T, M) distance evaluation -> argmax -> final least-squares refit on the
  winning inlier set (o3d also refits on inliers before returning).

Inlier distances are computed against planar x/y/z columns: broadcasting a
(T, M, 3) tensor would tile-pad the 3 to 128 lanes and waste ~42x bandwidth.

Deterministic given the key; statistically equivalent to the reference
(bitwise parity with an unseeded reference is not defined).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def fit_plane_weighted(points: jnp.ndarray, weights: jnp.ndarray) -> jnp.ndarray:
    """Least-squares plane for (M, 3) points with (M,) nonneg weights.

    Returns normalized ``[a, b, c, d]`` with ``||(a,b,c)|| = 1`` and
    ``a*x + b*y + c*z + d = 0``; the normal is the smallest-eigenvalue
    eigenvector of the weighted covariance.
    """
    wsum = jnp.maximum(jnp.sum(weights), 1e-12)
    w = weights / wsum
    centroid = jnp.sum(points * w[:, None], axis=0)
    centered = (points - centroid) * jnp.sqrt(w)[:, None]
    cov = centered.T @ centered  # (3, 3)
    # eigh returns ascending eigenvalues; the plane normal is eigvec 0.
    _, eigvecs = jnp.linalg.eigh(cov)
    normal = eigvecs[:, 0]
    norm = jnp.maximum(jnp.linalg.norm(normal), 1e-12)
    normal = normal / norm
    d = -jnp.dot(normal, centroid)
    return jnp.concatenate([normal, d[None]])


def point_plane_distance(points: jnp.ndarray, plane: jnp.ndarray) -> jnp.ndarray:
    """|a*x + b*y + c*z + d| / ||n|| for (..., 3) points, (..., 4) plane."""
    n = plane[..., :3]
    num = jnp.abs(jnp.sum(points * n, axis=-1) + plane[..., 3])
    return num / jnp.maximum(jnp.linalg.norm(n, axis=-1), 1e-12)


def point_plane_distance_planar(
    xs: jnp.ndarray, ys: jnp.ndarray, zs: jnp.ndarray, plane: jnp.ndarray
) -> jnp.ndarray:
    """|n.p + d|/||n|| over planar coords; plane (..., 4) broadcasts against
    (M,) coords to (..., M) without materializing any (..., M, 3) tensor."""
    a = plane[..., 0:1]
    b = plane[..., 1:2]
    c = plane[..., 2:3]
    d = plane[..., 3:4]
    num = jnp.abs(a * xs + b * ys + c * zs + d)
    nrm = jnp.sqrt(a * a + b * b + c * c)
    return (num / jnp.maximum(nrm, 1e-12)).reshape(*plane.shape[:-1], xs.shape[0])


def ransac_plane(
    points: jnp.ndarray,
    num_valid: jnp.ndarray,
    key: jax.Array,
    threshold: float = 0.1,
    ransac_n: int = 10,
    num_hypotheses: int = 100,
) -> jnp.ndarray:
    """RANSAC plane over the first ``num_valid`` rows of a padded (M, 3) set.

    Rows at index >= num_valid are ignored for sampling, inlier counting and
    the refit.  Returns the normalized (4,) plane.
    """
    M = points.shape[0]
    nv = jnp.maximum(num_valid, 1)

    u = jax.random.uniform(key, (num_hypotheses, ransac_n))
    samp_idx = jnp.minimum((u * nv).astype(jnp.int32), nv - 1)  # (T, n)
    samples = points[samp_idx]  # (T, n, 3) — small

    ones = jnp.ones((ransac_n,), dtype=points.dtype)
    planes = jax.vmap(lambda p: fit_plane_weighted(p, ones))(samples)  # (T, 4)

    xs, ys, zs = points[:, 0], points[:, 1], points[:, 2]
    valid = (jnp.arange(M) < num_valid).astype(points.dtype)  # (M,)
    dists = point_plane_distance_planar(xs, ys, zs, planes)  # (T, M)
    inlier = (dists < threshold).astype(points.dtype) * valid[None, :]
    counts = jnp.sum(inlier, axis=-1)
    best = jnp.argmax(counts)

    # Final least-squares refit on the winning inliers (o3d behavior).
    best_inlier = inlier[best]
    refit = fit_plane_weighted(points, best_inlier)
    # Guard: if the winner somehow has < 3 inliers fall back to the hypothesis.
    return jnp.where(counts[best] >= 3, refit, planes[best])


def compact_random_subset_planar(
    xs: jnp.ndarray,
    ys: jnp.ndarray,
    zs: jnp.ndarray,
    mask: jnp.ndarray,
    key: jax.Array,
    capacity: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Gather a uniformly random masked subset into a small (capacity, 3) set.

    Equivalent of the reference's ``np.random.choice(..., 5000,
    replace=False)`` ground-point subsample (``utils/segment_utils.py:102-104``)
    on fixed shapes: one random priority per row, unmasked rows pushed back,
    one argsort, first ``capacity`` rows kept.

    Returns ``(subset (capacity, 3), count)``; rows past ``count`` are
    arbitrary and must be masked by the consumer.
    """
    u = jax.random.uniform(key, (xs.shape[0],))
    prio = jnp.where(mask, u, 2.0)
    order = jnp.argsort(prio)[:capacity]
    subset = jnp.stack([xs[order], ys[order], zs[order]], axis=-1)
    count = jnp.minimum(jnp.sum(mask.astype(jnp.int32)), capacity)
    return subset, count


def compact_random_subset(
    points: jnp.ndarray, mask: jnp.ndarray, key: jax.Array, capacity: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(N, 3) convenience wrapper around the planar implementation."""
    return compact_random_subset_planar(
        points[:, 0], points[:, 1], points[:, 2], mask, key, capacity
    )
