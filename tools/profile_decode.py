"""One-off: where does e2e decode spend time? (config 1, B=32)"""
import time, sys, os
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
from rpcc_tpu.config import CodecConfig, LidarConfig
from rpcc_tpu.data import __lidar_cfg__
from rpcc_tpu.data.pointcloud_io import load_point_cloud
from rpcc_tpu.parallel import BatchEngine

BATCH = 32
pc = load_point_cloud("/root/reference/assets/example_data/example.bin").astype(np.float32)
lidar = LidarConfig.from_yaml(__lidar_cfg__["Velodyne64E"], name="Velodyne64E")
engine = BatchEngine(lidar, CodecConfig(), batch_size=BATCH, workers=8)
rng = np.random.default_rng(0)
clouds = [(pc + rng.normal(0, 0.001, pc.shape)).astype(np.float32) for _ in range(BATCH)]
results = engine.encode_frames(clouds, seeds=range(BATCH))
blobs = [b for b, _ in results]
engine.decode_blobs(blobs)  # warm


def t(label, fn, n=3):
    best = 1e9
    r = None
    for _ in range(n):
        t0 = time.perf_counter()
        r = fn()
        best = min(best, time.perf_counter() - t0)
    print(f"{label:40s} {best*1000:9.1f} ms/batch  {best*1000/BATCH:7.2f} ms/frame", flush=True)
    return r


# stage 1: host entropy decode + field rebuild + upload + dispatch + device
def disp():
    dec, live = engine.decode_blobs_device(blobs)
    jax.block_until_ready(dec.range_image)
    return dec, live

dec, live = t("entropy+upload+device (block)", disp)

# host entropy decode alone
from rpcc_tpu.codec import rans_codec
from rpcc_tpu.codec.bitstream import unpack_bitstream
packed = [unpack_bitstream(b, uniform=True) for b in blobs]
t("unpack_bitstream x32", lambda: [unpack_bitstream(b, uniform=True) for b in blobs])
t("rans decode residual batch", lambda: rans_codec.decompress_delta_batch(
    [p["residual_quantized"] for p in packed]))
t("rans decode contour batch", lambda: rans_codec.decompress_contour_batch(
    [p["contour_map"] for p in packed]))
t("entropy.decompress rest", lambda: [
    {k: engine.entropy.decompress(v) for k, v in p.items()
     if k not in ("residual_quantized", "contour_map")} for p in packed])

# download
def dl():
    dec2, _ = engine.decode_blobs_device(blobs)
    return np.asarray(dec2.range_image)

t("full: device + download ri f32", dl)
t("back_project after fresh decode", lambda: engine._back_project(*engine.decode_blobs_device(blobs)))
t("decode_blobs total", lambda: engine.decode_blobs(blobs))
