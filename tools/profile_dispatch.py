"""One-off: why does a single encode dispatch cost ~337ms when sustained
device time is ~34ms/batch and the upload is ~9ms?"""
import time, sys, os
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
from rpcc_tpu.config import CodecConfig, LidarConfig
from rpcc_tpu.data import __lidar_cfg__
from rpcc_tpu.data.pointcloud_io import load_point_cloud
from rpcc_tpu.parallel import BatchEngine
from rpcc_tpu.ops.projection import project_points_host

BATCH = 32
pc = load_point_cloud("/root/reference/assets/example_data/example.bin").astype(np.float32)
lidar = LidarConfig.from_yaml(__lidar_cfg__["Velodyne64E"], name="Velodyne64E")
cfg = CodecConfig()
engine = BatchEngine(lidar, cfg, batch_size=BATCH, workers=8)

ri = project_points_host(pc, lidar)
pts = np.repeat(ri[None], BATCH, axis=0)
seeds = np.arange(BATCH, dtype=np.uint32)
step = engine._step_arg

out = engine._encode_b(pts, seeds, step)
jax.block_until_ready(out)  # warm

dev = jax.devices()[0]
pts_dev = jax.device_put(pts, dev)
seeds_dev = jax.device_put(seeds, dev)
jax.block_until_ready((pts_dev, seeds_dev))


def t(label, fn, n=4):
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    print(f"{label:44s} {best*1000:9.1f} ms", flush=True)


t("encode(numpy) + block", lambda: jax.block_until_ready(engine._encode_b(pts, seeds, step)))
t("encode(device-resident) + block", lambda: jax.block_until_ready(engine._encode_b(pts_dev, seeds_dev, step)))


def queued(n=6):
    outs = [engine._encode_b(pts_dev, seeds_dev, step) for _ in range(n)]
    t0 = time.perf_counter()
    jax.block_until_ready(outs[-1])
    return (time.perf_counter() - t0) / 1  # only the tail wait


def queued_full(n=6):
    t0 = time.perf_counter()
    outs = [engine._encode_b(pts_dev, seeds_dev, step) for _ in range(n)]
    jax.block_until_ready(outs)
    dt = time.perf_counter() - t0
    print(f"queued x{n} (device-resident): {dt*1000/n:9.1f} ms/exec", flush=True)


queued_full()

# which output leaf is slow to become ready?
names = type(out)._fields
o = engine._encode_b(pts_dev, seeds_dev, step)
t0 = time.perf_counter()
for nm in names:
    leaf = getattr(o, nm)
    if leaf is None:
        continue
    jax.block_until_ready(leaf)
    print(f"  ready {nm:24s} +{(time.perf_counter()-t0)*1000:9.1f} ms", flush=True)

# block only on one small leaf, repeatedly
t("encode(dev) + block(stream_len only)", lambda: jax.block_until_ready(engine._encode_b(pts_dev, seeds_dev, step).stream_len))

t("encode(put(pts)+put(seeds)) + block", lambda: jax.block_until_ready(
    engine._encode_b(jax.device_put(pts, dev), jax.device_put(seeds, dev), step)))
t("encode(put(pts), seeds numpy) + block", lambda: jax.block_until_ready(
    engine._encode_b(jax.device_put(pts, dev), seeds, step)))
t("encode(pts numpy, seeds dev) + block", lambda: jax.block_until_ready(
    engine._encode_b(pts, seeds_dev, step)))
