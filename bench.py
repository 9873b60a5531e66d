"""Benchmark: end-to-end encode throughput on KITTI 64E (BASELINE.json config 1).

Measures frames/sec/chip for the full pipeline — device encode (projection,
ground RANSAC, FPS segmentation, point modeling, intra-prediction, uniform
quantization, contour coding) + host entropy (bzip2) + .rpcc framing — on the
repo's real 122,320-point example frame at accuracy 0.02, batched.

Prints ONE JSON line:
  {"metric": ..., "value": fps, "unit": "frames/s/chip", "vs_baseline": x}

vs_baseline: the reference implementation runs single-digit fps end-to-end on
its GPU-assisted path (BASELINE.md "single-digit-fps Python baseline"); we
use 5 frames/s as the baseline denominator.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

BASELINE_FPS = 5.0
EXAMPLE = "/root/reference/assets/example_data/example.bin"
BATCH = 32  # amortizes per-call dispatch latency; 346 fps/chip device-side
BATCHES_TIMED = 6


def main() -> None:
    import jax

    from rpcc_tpu.config import CodecConfig, LidarConfig
    from rpcc_tpu.data import __lidar_cfg__
    from rpcc_tpu.data.pointcloud_io import load_point_cloud
    from rpcc_tpu.parallel import BatchEngine

    lidar = LidarConfig.from_yaml(__lidar_cfg__["Velodyne64E"], name="Velodyne64E")
    cfg = CodecConfig()  # uniform, point modeling, FPS, bzip2, accuracy 0.02

    pc = load_point_cloud(EXAMPLE).astype(np.float32)
    clouds = [pc] * BATCH

    n_chips = max(1, len(jax.devices()))
    engine = BatchEngine(lidar, cfg, batch_size=BATCH, workers=8)

    # Warm-up: compile + first transfer excluded (reference does the same for
    # CUDA init, tools/compress.py:87-90).
    results = engine.encode_frames(clouds, seeds=range(BATCH))
    blob0 = results[0][0]

    # Device-only throughput (what the TPU sustains; e2e adds the host
    # entropy stage and this rig's tunnel transfers).  Inputs are made
    # device-resident first so this measures compute, not the tunnel.
    pts16 = jax.device_put(_stack_one(pc))
    seeds16 = jax.device_put(np.arange(BATCH, dtype=np.uint32))
    step16 = np.float32(cfg.step)
    jax.block_until_ready(engine._encode_b(pts16, seeds16, step16))
    t0 = time.perf_counter()
    for _ in range(3):
        jax.block_until_ready(engine._encode_b(pts16, seeds16, step16))
    device_fps = 3 * BATCH / (time.perf_counter() - t0) / n_chips

    # E2E throughput: 3-stage pipeline — uploads run on the engine's
    # uploader thread (IO wait overlaps host entropy), device compute runs
    # async, entropy finalization on the main thread.  Per-batch times on a
    # tunneled dev rig swing +-40% with link weather, so sample for a fixed
    # wall window (min BATCHES_TIMED batches) and report the median rate.
    batch_times = []
    n_frames = BATCH
    pending = engine.encode_batch_async(clouds, seeds=range(BATCH))
    t_start = time.perf_counter()
    i = 0
    while i + 1 < BATCHES_TIMED or (
        time.perf_counter() - t_start < 45.0 and i < 30
    ):
        i += 1
        t0 = time.perf_counter()
        nxt = engine.encode_batch_async(clouds, seeds=range(i * BATCH, (i + 1) * BATCH))
        engine.finalize_encoded(*pending.result())
        pending = nxt
        batch_times.append(time.perf_counter() - t0)
        n_frames += BATCH
    t0 = time.perf_counter()
    engine.finalize_encoded(*pending.result())
    batch_times.append(time.perf_counter() - t0)
    batch_times.sort()
    median_bt = batch_times[len(batch_times) // 2]
    fps = BATCH / median_bt / n_chips

    # Quality guardrails on the timed config.
    out = engine._encode_b(pts16, seeds16, step16)
    n_pts = int((np.asarray(out.range_image[0]) > 0).sum())
    bpp = len(blob0) * 8 / n_pts

    print(
        json.dumps(
            {
                "metric": "kitti64e_e2e_encode_throughput_acc0.02_bzip2",
                "value": round(fps, 3),
                "unit": "frames/s/chip",
                "vs_baseline": round(fps / BASELINE_FPS, 3),
                "bpp": round(bpp, 4),
                "device_only_fps": round(device_fps, 1),
                "chips": n_chips,
                "frames": n_frames,
            }
        )
    )


def _stack_one(pc: np.ndarray) -> np.ndarray:
    from rpcc_tpu.models.pipeline import pad_points

    padded = pad_points(pc)
    return padded[None].repeat(BATCH, axis=0)


if __name__ == "__main__":
    main()
