"""One-off: interleaved A/B of host-entropy vs device-entropy e2e encode."""
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
eng_host = BatchEngine(lidar, CodecConfig(transfer_precision="u16"), batch_size=32, workers=8)
eng_dev = BatchEngine(
    lidar, CodecConfig(transfer_precision="u16", device_entropy=True),
    batch_size=32, workers=8,
)
eng_host.encode_frames([pc] * 32, seeds=range(32))
eng_dev.encode_frames([pc] * 32, seeds=range(32))
B.WALL_WINDOW_S = 25.0
for rep in range(3):
    a = B.measure_e2e(eng_host, pc, 1)
    b = B.measure_e2e(eng_dev, pc, 1)
    print(f"rep {rep}: host-entropy u16 {a:.1f} fps   device-entropy u16 {b:.1f} fps", flush=True)
