"""Projection kernel tests: scatter-min semantics, round-trip, binning parity
with a straightforward numpy re-statement of the reference C++ loop
(cpp_modules.cpp:427-467)."""

import math

import numpy as np
import jax.numpy as jnp
import pytest

from rpcc_tpu.config import LidarConfig
from rpcc_tpu.ops.projection import (
    build_transform_map,
    project_points,
    range_image_to_points,
)

LIDAR_64E = LidarConfig(
    name="Velodyne64E",
    horizontal_fov_deg=360.0,
    vertical_angle_max_deg=2.0,
    vertical_angle_min_deg=-24.9,
    height=64,
    width=2000,
)

SMALL = LidarConfig(
    name="small",
    horizontal_fov_deg=360.0,
    vertical_angle_max_deg=2.0,
    vertical_angle_min_deg=-24.9,
    height=8,
    width=64,
)


def numpy_reference_projection(pc, lidar):
    """Sequential keep-nearest loop, the C++ kernel's semantics."""
    H, W = lidar.height, lidar.width
    ri = np.zeros((H, W), dtype=np.float32)
    for p in pc.astype(np.float32):
        x, y, z = float(p[0]), float(p[1]), float(p[2])
        depth = math.sqrt(x * x + y * y + z * z)
        if depth <= 0:
            continue
        ha = math.atan2(y, x)
        if ha < 0:
            ha += 2 * 3.14159265
        va = math.atan2(z, math.sqrt(x * x + y * y))
        col = int(np.float32(round(np.float32(ha / lidar.horizontal_fov * W)))) % W
        vres = (lidar.vertical_max - lidar.vertical_min) / (H - 1)
        row = round(np.float32((va - lidar.vertical_min) / vres))
        row = min(max(row, 0), H - 1)
        if ri[row, col] == 0 or depth < ri[row, col]:
            ri[row, col] = depth
    return ri


def random_cloud(n, seed=0):
    rng = np.random.default_rng(seed)
    depth = rng.uniform(2.0, 80.0, n)
    az = rng.uniform(0, 2 * np.pi, n)
    el = rng.uniform(LIDAR_64E.vertical_min, LIDAR_64E.vertical_max, n)
    x = depth * np.cos(el) * np.cos(az)
    y = depth * np.cos(el) * np.sin(az)
    z = depth * np.sin(el)
    return np.stack([x, y, z], -1).astype(np.float32)


def test_transform_map_matches_reference_formula():
    tm = build_transform_map(SMALL)
    H, W = SMALL.height, SMALL.width
    vfov = SMALL.vertical_max - SMALL.vertical_min
    for h in [0, 3, H - 1]:
        for w in [0, 17, W - 1]:
            alt = vfov * (h / (H - 1)) + SMALL.vertical_min
            az = SMALL.horizontal_fov * (w / W)
            exp = np.array(
                [math.cos(alt) * math.cos(az), math.cos(alt) * math.sin(az), math.sin(alt)],
                dtype=np.float32,
            )
            np.testing.assert_allclose(tm[h, w], exp, rtol=1e-6)
    # rays are unit norm
    np.testing.assert_allclose(np.linalg.norm(tm, axis=-1), 1.0, atol=1e-6)


def test_projection_matches_numpy_reference():
    pc = random_cloud(5000)
    ours = np.asarray(project_points(jnp.asarray(pc), LIDAR_64E))
    ref = numpy_reference_projection(pc, LIDAR_64E)
    mismatch = np.abs(ours - ref) > 1e-5
    # float32 atan2 boundary bins may differ on a handful of points
    assert mismatch.mean() < 1e-3, f"{mismatch.sum()} mismatched pixels"


def test_projection_keeps_nearest_on_collision():
    # two points in the same pixel: the nearer survives
    base = random_cloud(1)[0]
    far = base * 2.0
    ri = np.asarray(project_points(jnp.asarray(np.stack([far, base])), LIDAR_64E))
    nz = ri[ri > 0]
    assert nz.shape[0] == 1
    np.testing.assert_allclose(nz[0], np.linalg.norm(base), rtol=1e-5)


def test_padding_points_are_ignored():
    pc = random_cloud(100)
    padded = np.concatenate([pc, np.zeros((50, 3), np.float32)])
    a = np.asarray(project_points(jnp.asarray(pc), LIDAR_64E))
    b = np.asarray(project_points(jnp.asarray(padded), LIDAR_64E))
    np.testing.assert_array_equal(a, b)


def test_backprojection_roundtrip_error_bounded():
    """project -> backproject -> project is a fixed point, and the
    backprojected cloud sits within angular-bin distance of the original."""
    pc = random_cloud(20000, seed=1)
    tm = jnp.asarray(build_transform_map(LIDAR_64E))
    ri = project_points(jnp.asarray(pc), LIDAR_64E)
    pts = range_image_to_points(ri, tm)
    ri2 = project_points(np.asarray(pts).reshape(-1, 3), LIDAR_64E)
    # All surviving depths identical (projection of backprojection is stable).
    a, b = np.asarray(ri), np.asarray(ri2)
    both = (a > 0) & (b > 0)
    assert both.sum() > 0.95 * (a > 0).sum()
    np.testing.assert_allclose(a[both], b[both], rtol=1e-5)
