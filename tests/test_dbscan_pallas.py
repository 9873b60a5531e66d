"""Pallas DBSCAN kernel pinned element-exact against the jnp spec path.

The kernel (ops/dbscan_pallas.py) replaces the HBM-materialized hook/scan
sweeps of ``_dbscan_range_image_jnp`` with a VMEM-resident while_loop; both
must produce the *identical* compacted seg-map (same min-label forest, same
discovery-order compaction) — not just an equivalent partition.  Runs in
interpret mode on the CPU test backend.
"""

import numpy as np
import jax.numpy as jnp

from rpcc_tpu.ops.dbscan import (
    _compact_labels,
    _dbscan_range_image_jnp,
    dbscan_range_image,
)
from rpcc_tpu.ops.dbscan_pallas import dbscan_labels_pallas


def _both(pc_grid: np.ndarray, active: np.ndarray, eps: float, max_clusters=32):
    planes = jnp.asarray(np.transpose(pc_grid, (2, 0, 1)).copy())
    act = jnp.asarray(active)
    ref = np.asarray(_dbscan_range_image_jnp(planes, act, eps, max_clusters))
    raw = dbscan_labels_pallas(planes, act, eps, interpret=True)
    got = np.asarray(_compact_labels(raw, act, max_clusters))
    return got, ref


def test_pallas_matches_jnp_basic():
    H, W = 16, 64
    pc = np.zeros((H, W, 3), np.float32)
    active = np.zeros((H, W), bool)
    for r in range(2, 6):
        for c in range(5, 16):
            pc[r, c] = [10 + 0.01 * r, 0.01 * c, 0]
            active[r, c] = True
    for r in range(9, 13):
        for c in range(30, 41):
            pc[r, c] = [0.01 * r, 20 + 0.01 * c, 0]
            active[r, c] = True
    for c in range(50, 54):
        pc[14, c] = [5, 5, 3 + 0.01 * c]
        active[14, c] = True
    got, ref = _both(pc, active, eps=1.5)
    np.testing.assert_array_equal(got, ref)


def test_pallas_matches_jnp_long_wall():
    """Graph diameter ~200: exercises the convergence loop, not one sweep."""
    H, W = 16, 256
    pc = np.zeros((H, W, 3), np.float32)
    active = np.zeros((H, W), bool)
    for r in (7, 8):
        for c in range(20, 220):
            pc[r, c] = [0.245 * c, 14.0, 0.3 * r]
            active[r, c] = True
    got, ref = _both(pc, active, eps=1.5)
    np.testing.assert_array_equal(got, ref)
    assert len(set(got[active].tolist())) == 1


def test_pallas_matches_jnp_fuzz():
    """Random blob scenes incl. column-wraparound neighbors."""
    H, W = 16, 128
    hspace, vspace = 0.245, 0.3
    for t in range(8):
        rng = np.random.default_rng(300 + t)
        pc = np.zeros((H, W, 3), np.float32)
        active = np.zeros((H, W), bool)
        centers = rng.uniform(-30, 30, (rng.integers(2, 6), 3))
        centers[:, 2] = rng.uniform(-1, 2, centers.shape[0])
        for ctr in centers:
            r0 = int(rng.integers(1, H - 5))
            c0 = int(rng.integers(0, W))  # may wrap the column seam
            nr = int(rng.integers(2, 5))
            nc = int(rng.integers(4, 13))
            for r in range(r0, r0 + nr):
                for c in range(c0, c0 + nc):
                    if rng.random() < 0.85:
                        jitter = rng.normal(0, 0.02, 3)
                        pc[r, c % W] = (
                            ctr + [hspace * (c - c0), vspace * (r - r0), 0] + jitter
                        )
                        active[r, c % W] = True
        for _ in range(6):
            r, c = int(rng.integers(0, H)), int(rng.integers(0, W))
            if not active[r, c]:
                pc[r, c] = rng.uniform(40, 80, 3)
                active[r, c] = True
        got, ref = _both(pc, active, eps=1.2)
        np.testing.assert_array_equal(got, ref, err_msg=f"scene {t}")


def test_dispatch_stays_jnp_on_cpu():
    """dbscan_range_image on the CPU test backend must use the jnp path
    (Pallas interpret is test-only); spot-check it still works end to end."""
    H, W = 8, 32
    pc = np.zeros((H, W, 3), np.float32)
    active = np.zeros((H, W), bool)
    for r in range(2, 6):
        for c in range(4, 20):
            pc[r, c] = [0.2 * c, 10.0, 0.3 * r]
            active[r, c] = True
    planes = jnp.asarray(np.transpose(pc, (2, 0, 1)).copy())
    seg = np.asarray(dbscan_range_image(planes, jnp.asarray(active), 1.5, 8))
    ref = np.asarray(_dbscan_range_image_jnp(planes, jnp.asarray(active), 1.5, 8))
    np.testing.assert_array_equal(seg, ref)
