"""Seeded, fully vectorized RANSAC plane fitting.

Replaces open3d's ``segment_plane`` (used at ``utils/segment_utils.py:75-82``
for the ground plane with ``threshold=0.1, ransac_n=10, num_iterations=100``
and at ``:207-209`` per cluster with ``ransac_n=4, num_iterations=10``).

The o3d implementation draws hypotheses *sequentially* and is unseeded, which
makes the reference encoder nondeterministic run-to-run (SURVEY.md §5 pitfall
7).  Here all hypotheses are drawn at once from a counter-based PRNG and
evaluated as one batched computation:

  sample (T, n) indices -> gather (T, n, 3) -> weighted-LSQ plane per
  hypothesis (3x3 eigh on the MXU-friendly covariance) -> inlier counts via a
  single (T, M) distance evaluation -> argmax -> final least-squares refit on
  the winning inlier set (o3d also refits on inliers before returning).

Deterministic given the key; statistically equivalent to the reference
(bitwise parity with an unseeded reference is not defined).
"""

from __future__ import annotations

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
    samples = points[samp_idx]  # (T, n, 3)

    ones = jnp.ones((ransac_n,), dtype=points.dtype)
    planes = jax.vmap(lambda p: fit_plane_weighted(p, ones))(samples)  # (T, 4)

    valid = (jnp.arange(M) < num_valid).astype(points.dtype)  # (M,)
    dists = point_plane_distance(points[None, :, :], planes[:, None, :])  # (T, M)
    inlier = (dists < threshold).astype(points.dtype) * valid[None, :]
    counts = jnp.sum(inlier, axis=-1)
    best = jnp.argmax(counts)

    # Final least-squares refit on the winning inliers (o3d behavior).
    best_inlier = inlier[best]
    refit = fit_plane_weighted(points, best_inlier)
    # Guard: if the winner somehow has < 3 inliers fall back to the hypothesis.
    return jnp.where(counts[best] >= 3, refit, planes[best])


def compact_random_subset(
    points: jnp.ndarray,
    mask: jnp.ndarray,
    key: jax.Array,
    capacity: int,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Gather a uniformly random subset of masked rows into a fixed buffer.

    Equivalent of the reference's ``np.random.choice(..., 5000,
    replace=False)`` ground-point subsample (``utils/segment_utils.py:102-104``)
    on fixed shapes: draw one uniform priority per row, push unmasked rows to
    the back, argsort once, keep the first ``capacity`` rows.

    Returns ``(subset (capacity, 3), count)`` with ``count = min(#mask,
    capacity)``; rows past ``count`` are arbitrary and must be masked by the
    consumer.
    """
    u = jax.random.uniform(key, (points.shape[0],))
    prio = jnp.where(mask, u, 2.0)
    order = jnp.argsort(prio)
    subset = points[order[:capacity]]
    count = jnp.minimum(jnp.sum(mask.astype(jnp.int32)), capacity)
    return subset, count
