"""One-off: B=32 vs B=64 for the flagship engine (device entropy + u16)."""
import sys, os
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench as B
from rpcc_tpu.config import CodecConfig, LidarConfig
from rpcc_tpu.data import __lidar_cfg__
from rpcc_tpu.data.pointcloud_io import load_point_cloud
from rpcc_tpu.parallel import BatchEngine

lidar = LidarConfig.from_yaml(__lidar_cfg__["Velodyne64E"], name="Velodyne64E")
pc = load_point_cloud(B.EXAMPLE).astype(np.float32)
cfg = CodecConfig(transfer_precision="u16", device_entropy=True)
e32 = BatchEngine(lidar, cfg, batch_size=32, workers=8)
e64 = BatchEngine(lidar, cfg, batch_size=64, workers=8)
e32.encode_frames([pc] * 32, seeds=range(32))
print("e32 warm", flush=True)
e64.encode_frames([pc] * 64, seeds=range(64))
print("e64 warm", flush=True)

import time

def measure(engine, batch, wall=25.0):
    variants = B._jittered_variants(pc, 8)
    t_start = time.perf_counter()

    def gen():
        k = 0
        while k < 4 or (time.perf_counter() - t_start < wall and k < 30):
            yield [variants[k % 8]] * batch, range(k * batch, (k + 1) * batch)
            k += 1

    arr = []
    for _ in engine.encode_pipeline(gen()):
        arr.append(time.perf_counter())
    d = sorted(b - a for a, b in zip(arr[1:-1], arr[2:]))
    return batch / d[len(d) // 2] if d else 0.0

for rep in range(2):
    a = measure(e32, 32)
    b = measure(e64, 64)
    print(f"rep {rep}: B=32 {a:.1f} fps   B=64 {b:.1f} fps", flush=True)
