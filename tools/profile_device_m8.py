"""One-off: per-op device timing of the flagship m8 encode graph.

Finds the next-largest device stage after the r5 row-gather fix (m8
device-only 340 fps = 2.94 ms/frame at batch 64).  Uses the cached
bench program (same engine construction as bench.py), traces a few
steady-state reps, and aggregates per-op time via
rpcc_tpu.utils.profiling.summarize_trace.
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np
import jax

from rpcc_tpu.config import CodecConfig, LidarConfig
from rpcc_tpu.data import __lidar_cfg__
from rpcc_tpu.data.pointcloud_io import load_point_cloud
from rpcc_tpu.parallel import BatchEngine
from rpcc_tpu.utils.profiling import summarize_trace

BATCH = 64
pc = load_point_cloud("/root/reference/assets/example_data/example.bin").astype(
    np.float32
)
lidar = LidarConfig.from_yaml(__lidar_cfg__["Velodyne64E"], name="Velodyne64E")
engine = BatchEngine(lidar, CodecConfig(), batch_size=BATCH, workers=8)
rng = np.random.default_rng(0)
clouds = [(pc + rng.normal(0, 0.001, pc.shape)).astype(np.float32) for _ in range(BATCH)]

pts, seeds, tail, _ = engine._prepare_batch(clouds, seeds=range(BATCH))
dev_args = tuple(jax.device_put(a) for a in (pts, seeds, engine._step_arg, *tail))

jax.block_until_ready(engine._encode_b(*dev_args))  # warm (compile cached)

# quick fps check first
t0 = time.perf_counter()
out = None
for _ in range(6):
    out = engine._encode_b(*dev_args)
jax.block_until_ready(out)
fps = 6 * BATCH / (time.perf_counter() - t0)
print(f"device-only m8 encode: {fps:.1f} fps (batch {BATCH})", flush=True)

trace_dir = "/tmp/prof_m8"
with jax.profiler.trace(trace_dir):
    out = None
    for _ in range(3):
        out = engine._encode_b(*dev_args)
    jax.block_until_ready(out)

rows = summarize_trace(trace_dir, top=28)
print(f"\nTop device ops over 3 reps x batch {BATCH} "
      f"(divide ms by {3 * BATCH} for ms/frame):")
for ms, name, source in rows:
    print(f"  {ms:9.3f} ms  {name[:52]:54} {source}", flush=True)
