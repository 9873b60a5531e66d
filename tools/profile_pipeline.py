"""One-off: where does encode_pipeline spend wall time per batch?"""
import time, sys, os
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
from rpcc_tpu.config import CodecConfig, LidarConfig
from rpcc_tpu.data import __lidar_cfg__
from rpcc_tpu.data.pointcloud_io import load_point_cloud
from rpcc_tpu.parallel import BatchEngine
import rpcc_tpu.parallel.engine as eng

BATCH = 32
pc = load_point_cloud("/root/reference/assets/example_data/example.bin").astype(np.float32)
lidar = LidarConfig.from_yaml(__lidar_cfg__["Velodyne64E"], name="Velodyne64E")
cfg = CodecConfig()
engine = BatchEngine(lidar, cfg, batch_size=BATCH, workers=8)

rng = np.random.default_rng(1234)
variants = [(pc + rng.normal(0, 0.001, pc.shape)).astype(np.float32) for _ in range(8)]

engine.encode_frames([pc] * BATCH, seeds=range(BATCH))  # warm

# wrap the stages with timers
orig_stage = engine.stage_downloads
orig_finish = engine.finish_staged
orig_encdev = engine.encode_batch_device
stage_t, finish_t, encdev_t = [], [], []

def stage_timed(out, live):
    t0 = time.perf_counter(); r = orig_stage(out, live); stage_t.append(time.perf_counter() - t0); return r

def finish_timed(st):
    t0 = time.perf_counter(); r = orig_finish(st); finish_t.append(time.perf_counter() - t0); return r

def encdev_timed(clouds, seeds=None):
    t0 = time.perf_counter(); r = orig_encdev(clouds, seeds); encdev_t.append(time.perf_counter() - t0); return r

engine.stage_downloads = stage_timed
engine.finish_staged = finish_timed
engine.encode_batch_device = encdev_timed

def gen():
    for k in range(10):
        yield [variants[k % 8]] * BATCH, range(k * BATCH, (k + 1) * BATCH)

arr = []
t_start = time.perf_counter()
for res in engine.encode_pipeline(gen()):
    arr.append(time.perf_counter())

deltas = [b - a for a, b in zip(arr[1:-1], arr[2:])]
print("batch arrival deltas (ms):", [round(d * 1000) for d in deltas])
print("encode_batch_device (uploader thread) ms:", [round(t * 1000) for t in encdev_t])
print("stage_downloads ms:", [round(t * 1000) for t in stage_t])
print("finish_staged ms:", [round(t * 1000) for t in finish_t])
print(f"total {time.perf_counter()-t_start:.2f}s for 10 batches -> "
      f"{10*BATCH/(time.perf_counter()-t_start):.1f} fps")
