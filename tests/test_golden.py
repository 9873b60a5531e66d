"""Golden determinism tests on the real KITTI example frame (CPU backend).

Locks the encoder's observable behavior: bitstream byte-determinism across
runs, the bpp operating point staying in the expected band, and decode being
an exact inverse.  (Absolute bpp can move when the algorithm legitimately
changes — the band is wide; the determinism checks are strict.)
"""

import hashlib
import os

import numpy as np
import pytest

from rpcc_tpu.config import CodecConfig, LidarConfig
from rpcc_tpu.data import __lidar_cfg__
from rpcc_tpu.models.pipeline import RPCCCodec

EXAMPLE = "/root/reference/assets/example_data/example.bin"

pytestmark = pytest.mark.skipif(
    not os.path.exists(EXAMPLE), reason="example frame not available"
)


@pytest.fixture(scope="module")
def codec_and_frame():
    from rpcc_tpu.data.pointcloud_io import load_point_cloud

    lidar = LidarConfig.from_yaml(__lidar_cfg__["Velodyne64E"], name="Velodyne64E")
    # The f32 goldens pin their exact config: the shipped default flipped to
    # the benched flagship (m8 transfer) in r4, which snaps depths to the
    # u16 grid before quantizing — a different (pinned separately below),
    # equally deterministic bitstream.
    cfg = CodecConfig(transfer_precision="f32", device_entropy=False)
    return RPCCCodec(lidar, cfg), load_point_cloud(EXAMPLE)


# Pinned operating points (uniform/point/FPS, acc 0.02, seed 0) on the
# KITTI example frame, CPU backend: the default config (rans) and the
# reference-parity entropy coder (bzip2).  BPP pins are ±5% regression
# tripwires; SHAs pin the exact bitstreams.  When the algorithm legitimately
# changes, update with a one-line justification:
#  - 2026-08-16 r2 baseline: bzip2 bpp 3.1069, 36527 bytes (round-1 encoder).
#  - 2026-08-16 r2: smallest_eigvec_3x3 unit-normalization fix shifted the
#    ground plane by float ulps (bzip2 bpp 3.1072).
#  - 2026-08-16 r2: ground subsample now draws a candidate pool instead of
#    argsorting the whole grid (different random subset -> slightly
#    different ground plane; bzip2 bpp 3.0803).
#  - 2026-08-16 r2: default compressor flipped to rans (compact tables +
#    wavefront contour coding): default bpp 2.8144.
#  - 2026-08-16 r2: ground candidate pool is a random-phase strided lattice
#    (random-index gathers cost 28ms/batch on TPU): rans bpp 2.8200.
#  - 2026-08-16 r2: projection moved to the host production path (numpy f32
#    binning + native scatter-min; backend-independent bitstreams, 3x
#    smaller uploads).  Depths differ from the XLA in-graph path by FMA-
#    contraction ulps: rans bpp 2.8205, bzip2 bpp 3.0981.
#  - 2026-08-16 r2: idx_sequence container switched to zlib-9 over the u8
#    view (beats bz2 32/32 frames, ~5% smaller, 5x faster): rans bpp 2.8078.
#  - 2026-08-16 r2: host projection angles/depth now use the deterministic
#    f64 kernels shared bit-for-bit by the numpy fallback and the fused
#    native C++ kernel (projection.py::_atan2_det): rans bpp 2.8090,
#    bzip2 bpp 3.0952.
#  - 2026-08-17 r2: LIVE-AWARE rANS lanes (tail padding neither modeled nor
#    coded — required so the fixed-shape on-device encoder matches host
#    sizes): rans bpp 2.8081.
#  - 2026-08-17 r3: idx_sequence zlib level 9 -> 6 (saves ~1 ms/frame of
#    host time for +31 B on ~34 KB, +0.0006 bpp): rans bpp 2.8087.
GOLDEN_BPP = 2.8087
GOLDEN_SHA = "5892614a2d78c5fe97cc24967b1e58541667f97d0b6c1fbc706adbee5608a07e"
GOLDEN_BZIP2_BPP = 3.0952
GOLDEN_BZIP2_SHA = "146cd8ff37c8d94e2bb988fb3ca5c14689423a6ff59d5b9c2a7645aa4b4142d3"
#  - 2026-08-18 r4: the DEFAULT config is now the benched flagship
#    (transfer_precision='m8', device_entropy=True).  Its bitstream is the
#    u16-snap-grid operating point (bit-identical across u16/i8/m8 and
#    across the single-frame/engine/mesh paths — test_m8_transfer.py,
#    test_engine.py), pinned here on the same KITTI frame.
GOLDEN_FLAGSHIP_BPP = 2.8082
GOLDEN_FLAGSHIP_SHA = "da42ed69ef07d5f8f25c71f90ff21c09c28721d58aef3bae2fab4d58be4d13e4"


def test_kitti_example_operating_point(codec_and_frame):
    codec, pc = codec_and_frame
    blob, fields, _ = codec.compress(pc)
    ri = np.asarray(codec.encode_device(pc).range_image)
    n_pts = int((ri > 0).sum())
    bpp = len(blob) * 8 / n_pts
    assert abs(bpp - GOLDEN_BPP) / GOLDEN_BPP < 0.05, (
        f"bpp {bpp:.4f} drifted >5% from pinned {GOLDEN_BPP}"
    )
    assert hashlib.sha256(blob).hexdigest() == GOLDEN_SHA, (
        "bitstream bytes changed — if intentional, re-pin GOLDEN_SHA/GOLDEN_BPP "
        "with a justification line"
    )

    pc_rec, ri_rec, _ = codec.decompress(blob)
    err = np.abs(ri_rec - ri)
    assert err.max() <= codec.cfg.step + 1e-5
    assert (ri_rec[ri == 0] == 0).all()


def test_kitti_example_bzip2_operating_point(codec_and_frame):
    _, pc = codec_and_frame
    from rpcc_tpu.data import __lidar_cfg__ as _cfgs

    lidar = LidarConfig.from_yaml(_cfgs["Velodyne64E"], name="Velodyne64E")
    codec = RPCCCodec(
        lidar,
        CodecConfig(
            basic_compressor="bzip2", transfer_precision="f32", device_entropy=False
        ),
    )
    blob, _, _ = codec.compress(pc)
    ri = np.asarray(codec.encode_device(pc).range_image)
    bpp = len(blob) * 8 / int((ri > 0).sum())
    assert abs(bpp - GOLDEN_BZIP2_BPP) / GOLDEN_BZIP2_BPP < 0.05
    assert hashlib.sha256(blob).hexdigest() == GOLDEN_BZIP2_SHA


def test_kitti_example_flagship_default_operating_point(codec_and_frame):
    """The bare CodecConfig() — what a user gets — is the benched flagship
    (m8 transfer + device entropy) and its bitstream is pinned."""
    _, pc = codec_and_frame
    cfg = CodecConfig()
    assert cfg.transfer_precision == "m8" and cfg.device_entropy, (
        "shipped defaults must be the benched flagship config"
    )
    lidar = LidarConfig.from_yaml(__lidar_cfg__["Velodyne64E"], name="Velodyne64E")
    codec = RPCCCodec(lidar, cfg)
    blob, _, _ = codec.compress(pc)
    ri = np.asarray(codec.encode_device(pc).range_image)
    n_pts = int((ri > 0).sum())
    bpp = len(blob) * 8 / n_pts
    assert abs(bpp - GOLDEN_FLAGSHIP_BPP) / GOLDEN_FLAGSHIP_BPP < 0.05
    assert hashlib.sha256(blob).hexdigest() == GOLDEN_FLAGSHIP_SHA

    pc_rec, ri_rec, _ = codec.decompress(blob)
    err = np.abs(ri_rec - ri)
    # reduced-transfer bound: quantization step + half the u16 snap grid
    assert err.max() <= codec.cfg.step + codec.cfg.step / 16.0 / 2.0 + 1e-5
    assert (ri_rec[ri == 0] == 0).all()


def test_kitti_example_bitstream_deterministic(codec_and_frame):
    codec, pc = codec_and_frame
    h = []
    for _ in range(2):
        blob, _, _ = codec.compress(pc)
        h.append(hashlib.sha256(blob).hexdigest())
    assert h[0] == h[1]


def test_seed_changes_bitstream(codec_and_frame):
    codec, pc = codec_and_frame
    out0 = codec.encode_device(pc, seed=0)
    out1 = codec.encode_device(pc, seed=1)
    assert int(out0.stream_len) > 0 and int(out1.stream_len) > 0
    # The seed must actually thread into the RANSAC/FPS PRNG: different
    # seeds on the same frame must yield different quantized streams (a
    # seed that silently stops being wired in would make them identical).
    n0, n1 = int(out0.stream_len), int(out1.stream_len)
    s0 = np.asarray(out0.stream)[:n0]
    s1 = np.asarray(out1.stream)[:n1]
    assert n0 != n1 or not np.array_equal(s0, s1)
