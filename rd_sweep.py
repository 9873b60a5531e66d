"""Multi-frame rate-distortion sweep (VERDICT r2 item 8).

Real KITTI sequences are not on this rig, so the suite is 32 deterministic
variants of the repo's real 122,320-point KITTI frame.  Perturbations are
*grid-preserving* — yaw rotation, smooth radial warps (scene geometry
changes), per-point range jitter (sensor noise), and small dropout — because
a scan is captured one-point-per-beam: translating the cloud and
re-projecting punches resampling holes no real moving sensor produces
(measured +1.1 bpp of pure artifact).  For each accuracy in
{0.01, 0.02, 0.03, 0.04, 0.06} every frame is encoded (rans and bzip2 byte
sizes) and decoded, and the symmetric chamfer distance + F1(0.02) are
computed against the frame's own back-projected grid cloud (the reference's
eval convention, tools/compress.py:183).

Writes RD_SWEEP.json and prints a markdown table (mean +- std, worst case).
Accuracy is a traced argument, so the sweep reuses one compiled program.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

EXAMPLE = "/root/reference/assets/example_data/example.bin"
N_FRAMES = 32
ACCURACIES = (0.01, 0.02, 0.03, 0.04, 0.06)


def make_suite(pc: np.ndarray, n: int = N_FRAMES) -> list:
    rng = np.random.default_rng(1234)
    r = np.linalg.norm(pc, axis=-1)
    az = np.arctan2(pc[:, 1], pc[:, 0])
    dirs = pc / np.maximum(r, 1e-9)[:, None]
    frames = [pc]
    for _ in range(n - 1):
        yaw = rng.uniform(-np.pi, np.pi)
        c, s = np.cos(yaw), np.sin(yaw)
        rot = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
        # smooth radial warp: scene geometry genuinely changes, grid intact
        k = rng.integers(1, 4)
        amp = rng.uniform(0.0, 0.08)
        phase = rng.uniform(0, 2 * np.pi)
        warp = 1.0 + amp * np.sin(k * az + phase)
        jitter = rng.normal(0, 0.01, r.shape)  # ~1 cm sensor noise
        r2 = np.maximum(r * warp + jitter, 0.0)
        keep = rng.random(pc.shape[0]) > rng.uniform(0.0, 0.03)
        frames.append(((dirs * r2[:, None]) @ rot.T)[keep].astype(np.float32))
    return frames


def main() -> None:
    import jax

    from rpcc_tpu.codec.bitstream import pack_bitstream
    from rpcc_tpu.codec.entropy import BasicCompressor
    from rpcc_tpu.config import CodecConfig, LidarConfig
    from rpcc_tpu.data import __lidar_cfg__
    from rpcc_tpu.data.pointcloud_io import load_point_cloud
    from rpcc_tpu.metrics.chamfer import calc_chamfer_distance
    from rpcc_tpu.models.pipeline import RPCCCodec

    lidar = LidarConfig.from_yaml(__lidar_cfg__["Velodyne64E"], name="Velodyne64E")
    pc0 = load_point_cloud(EXAMPLE).astype(np.float32)
    frames = make_suite(pc0)

    codec = RPCCCodec(lidar, CodecConfig())  # rans default
    bz = BasicCompressor(method_name="bzip2")

    results = {}
    t_start = time.time()
    for acc in ACCURACIES:
        codec.cfg = codec.cfg.replace(accuracy=acc)  # traced — no recompile
        rows = []
        for i, pc in enumerate(frames):
            out = codec.encode_device(pc, seed=i)
            fields = codec.fields_from_device(out)
            blob = pack_bitstream(codec.entropy.compress_dict(fields), uniform=True)
            blob_bz = pack_bitstream(bz.compress_dict(fields), uniform=True)
            ri = np.asarray(out.range_image)
            n_pts = int((ri > 0).sum())
            pc_rec, ri_rec, _ = codec.decompress(blob)
            max_err = float(np.abs(ri_rec - ri).max())
            grid_pc = (ri[..., None] * codec.transform_map)[ri > 0]
            rec_pc = pc_rec[ri_rec > 0]
            res = calc_chamfer_distance(grid_pc, rec_pc.reshape(-1, 3), out=False)
            cd, f1 = res["mean"], res["f_score"]
            rows.append(
                {
                    "frame": i,
                    "bpp": len(blob) * 8 / n_pts,
                    "bpp_bzip2": len(blob_bz) * 8 / n_pts,
                    "chamfer": float(cd),
                    "f1_002": float(f1),
                    "max_err": max_err,
                }
            )
            assert max_err <= 2 * acc + 1e-5, f"bound violated at acc={acc} frame {i}"
        agg = {
            k: {
                "mean": float(np.mean([r[k] for r in rows])),
                "std": float(np.std([r[k] for r in rows])),
                "max": float(np.max([r[k] for r in rows])),
            }
            for k in ("bpp", "bpp_bzip2", "chamfer", "f1_002", "max_err")
        }
        results[str(acc)] = {"frames": rows, "aggregate": agg}
        a = agg
        print(
            f"acc={acc}: bpp {a['bpp']['mean']:.3f}+-{a['bpp']['std']:.3f} "
            f"(max {a['bpp']['max']:.3f})  bzip2 {a['bpp_bzip2']['mean']:.3f}  "
            f"CD {a['chamfer']['mean']:.5f}+-{a['chamfer']['std']:.5f} "
            f"(max {a['chamfer']['max']:.5f})  F1 {a['f1_002']['mean']:.4f}",
            flush=True,
        )

    with open(os.path.join(REPO, "RD_SWEEP.json"), "w") as f:
        json.dump({"n_frames": N_FRAMES, "suite": "example.bin seeded rigid+dropout",
                   "results": {k: v["aggregate"] for k, v in results.items()}}, f, indent=1)
    print(f"\nwrote RD_SWEEP.json in {time.time()-t_start:.0f}s")

    print("\n| accuracy | bpp (rans) | bpp (bzip2) | chamfer (m) | F1@0.02 |")
    print("|---|---|---|---|---|")
    for acc in ACCURACIES:
        a = results[str(acc)]["aggregate"]
        print(
            f"| {acc} | {a['bpp']['mean']:.3f} ± {a['bpp']['std']:.3f} "
            f"(max {a['bpp']['max']:.3f}) | {a['bpp_bzip2']['mean']:.3f} | "
            f"{a['chamfer']['mean']:.4f} ± {a['chamfer']['std']:.4f} "
            f"(max {a['chamfer']['max']:.4f}) | {a['f1_002']['mean']:.4f} |"
        )


if __name__ == "__main__":
    main()
