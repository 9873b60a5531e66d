"""Pallas FPS kernel vs the lax implementation (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp

from rpcc_tpu.ops.fps import furthest_point_sample_planar
from rpcc_tpu.ops.fps_pallas import furthest_point_sample_pallas


def test_pallas_fps_matches_lax():
    rng = np.random.default_rng(0)
    pts = rng.uniform(-30, 30, (3, 2048, 3)).astype(np.float32)
    pts[:, 500:900] = 0.0  # zero-masked region like the real pipeline
    xs, ys, zs = pts[..., 0], pts[..., 1], pts[..., 2]
    ref = np.stack(
        [
            np.asarray(
                furthest_point_sample_planar(
                    jnp.asarray(xs[b]), jnp.asarray(ys[b]), jnp.asarray(zs[b]), 32
                )
            )
            for b in range(3)
        ]
    )
    got = np.asarray(
        furthest_point_sample_pallas(
            jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(zs), 32, interpret=True
        )
    )
    np.testing.assert_array_equal(ref, got)


def test_pallas_fps_single_frame():
    rng = np.random.default_rng(1)
    pts = rng.uniform(-5, 5, (640, 3)).astype(np.float32)
    ref = np.asarray(
        furthest_point_sample_planar(
            jnp.asarray(pts[:, 0]), jnp.asarray(pts[:, 1]), jnp.asarray(pts[:, 2]), 10
        )
    )
    got = np.asarray(
        furthest_point_sample_pallas(
            jnp.asarray(pts[:, 0]), jnp.asarray(pts[:, 1]), jnp.asarray(pts[:, 2]), 10,
            interpret=True,
        )
    )
    np.testing.assert_array_equal(ref, got)
