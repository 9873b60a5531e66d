"""One-off: where does the e2e encode batch spend host time? (config 1, B=32)"""
import time, sys, os
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
from rpcc_tpu.config import CodecConfig, LidarConfig
from rpcc_tpu.data import __lidar_cfg__
from rpcc_tpu.data.pointcloud_io import load_point_cloud
from rpcc_tpu.parallel import BatchEngine
from rpcc_tpu.codec import rans_codec
from rpcc_tpu.codec.bitstream import pack_bitstream

BATCH = 32
pc = load_point_cloud("/root/reference/assets/example_data/example.bin").astype(np.float32)
lidar = LidarConfig.from_yaml(__lidar_cfg__["Velodyne64E"], name="Velodyne64E")
cfg = CodecConfig()
engine = BatchEngine(lidar, cfg, batch_size=BATCH, workers=8)
clouds = [pc] * BATCH

# warm
engine.encode_frames(clouds, seeds=range(BATCH))

def t(label, fn, n=3):
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter()
        r = fn()
        best = min(best, time.perf_counter() - t0)
    print(f"{label:34s} {best*1000:9.1f} ms/batch  {best*1000/BATCH:7.2f} ms/frame", flush=True)
    return r

pts_live = t("stack (host pad+copy)", lambda: engine._stack(clouds))
seeds = np.arange(BATCH, dtype=np.uint32)

def dispatch_block():
    out, live = engine.encode_batch_device(clouds, seeds)
    jax.block_until_ready(out)
    return out, live

out, live = t("stack+upload+dispatch+device", dispatch_block)

stream_len = np.asarray(out.stream_len); seq_len = np.asarray(out.seq_len)
from rpcc_tpu.parallel.engine import _bucket
m_stream = _bucket(int(stream_len.max()), engine.hw)
m_seq = _bucket(int(seq_len.max()), engine.hw)
print(f"m_stream={m_stream} m_seq={m_seq} dtypes stream={out.stream.dtype} seq={out.sequence.dtype}")

stream = t("download stream (B,m) i16", lambda: np.asarray(out.stream[:, :m_stream]))
seq = t("download seq (B,m) u16", lambda: np.asarray(out.sequence[:, :m_seq]))
contour_packed = t("download contour (B,hw/8) u8", lambda: np.asarray(out.contour_packed))
models = t("download models (B,M,4) f32", lambda: np.asarray(out.model_param))
t("download stream_len etc", lambda: (np.asarray(out.stream_len), np.asarray(out.seq_len)))

resid_list = [stream[i, : stream_len[i]].astype(np.int16) for i in range(live)]
resid_blobs = t("rans residual batch", lambda: rans_codec.compress_delta_batch(resid_list))
contour_blobs = t("rans contour batch", lambda: rans_codec.compress_contour_batch(
    [contour_packed[i] for i in range(live)], engine.H, engine.W))
seqs = [seq[i, : seq_len[i]].astype(np.uint16) for i in range(live)]
import bz2
def seq_blobs_fn():
    d = rans_codec.compress_delta_batch(seqs)
    return [min(x, bytes([rans_codec.MAGIC_BZ]) + bz2.compress(s.tobytes()), key=len)
            for x, s in zip(d, seqs)]
seq_blobs = t("rans+bz2 seq batch", seq_blobs_fn)

def frame_rest():
    outb = []
    for i in range(live):
        fields = {"plane_param": models[i].astype(np.float32)}
        compressed = engine.entropy.compress_dict(fields)
        compressed["residual_quantized"] = resid_blobs[i]
        compressed["contour_map"] = contour_blobs[i]
        compressed["idx_sequence"] = seq_blobs[i]
        outb.append(pack_bitstream(compressed, uniform=True))
    return outb
t("models bz2 + framing (serial)", frame_rest)

t("finalize_encoded (all, pooled)", lambda: engine.finalize_encoded(out, live))

# full e2e batch, single-threaded sequence (no overlap)
def full():
    o, l = engine.encode_batch_device(clouds, seeds)
    return engine.finalize_encoded(o, l)
t("full batch (dispatch+finalize)", full)
