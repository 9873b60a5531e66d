"""DBSCAN-mode segmentation + roundtrip tests."""

import numpy as np
import jax.numpy as jnp

from rpcc_tpu.config import CodecConfig, LidarConfig
from rpcc_tpu.models.pipeline import RPCCCodec
from rpcc_tpu.ops.dbscan import dbscan_range_image

from tests.test_roundtrip import SMALL, synth_scene


def test_dbscan_components_basic():
    """Two well-separated blobs -> two clusters; tiny blob -> noise."""
    H, W = 16, 64
    pc = np.zeros((H, W, 3), np.float32)
    active = np.zeros((H, W), bool)
    # blob A: rows 2-5, cols 5-15 around (10, 0, 0)
    for r in range(2, 6):
        for c in range(5, 16):
            pc[r, c] = [10 + 0.01 * r, 0.01 * c, 0]
            active[r, c] = True
    # blob B: rows 9-12, cols 30-40 around (0, 20, 0)
    for r in range(9, 13):
        for c in range(30, 41):
            pc[r, c] = [0.01 * r, 20 + 0.01 * c, 0]
            active[r, c] = True
    # tiny blob C (under min_points): 4 px
    for c in range(50, 54):
        pc[14, c] = [5, 5, 3 + 0.01 * c]
        active[14, c] = True

    planes = np.transpose(pc, (2, 0, 1)).copy()
    seg = np.asarray(
        dbscan_range_image(jnp.asarray(planes), jnp.asarray(active), eps=1.5, max_clusters=10)
    )
    a_ids = set(seg[2:6, 5:16].reshape(-1))
    b_ids = set(seg[9:13, 30:41].reshape(-1))
    c_ids = set(seg[14, 50:54])
    assert a_ids == {3}  # first discovered cluster (row-major)
    assert b_ids == {4}
    assert c_ids == {2}  # noise
    assert (seg[~active] == 0).all()


def test_dbscan_roundtrip():
    cfg = CodecConfig(segment_method="DBSCAN", cluster_num=16)
    codec = RPCCCodec(SMALL, cfg)
    pc = synth_scene(seed=7)
    blob, _, _ = codec.compress(pc)
    pc_rec, ri_rec, _ = codec.decompress(blob)
    ri = np.asarray(codec.encode_device(pc).range_image)
    err = np.abs(ri_rec - ri)
    assert err.max() <= cfg.step + 1e-5
    assert (ri_rec[ri == 0] == 0).all()
