"""Multi-frame, multi-config rate-distortion sweep (VERDICT r3 item 10).

Real KITTI sequences are not on this rig, so the 64E suites are
deterministic variants of the repo's real 122,320-point KITTI frame, and
the 32E suite perturbs a ray-cast urban scene on the 32E scan grid (the
same generator the bench uses).  Perturbations are *grid-preserving* — yaw
rotation, smooth radial warps (scene geometry changes), per-point range
jitter (sensor noise), and small dropout — because a scan is captured
one-point-per-beam: translating the cloud and re-projecting punches
resampling holes no real moving sensor produces (measured +1.1 bpp of pure
artifact).

CONFIGS x ACCURACIES matrix (the bench's advertised configs):
  uniform_point  — uniform / point / FPS (the headline config), 32 frames
  plane          — plane modeling, 16 frames
  nonuniform     — salience-driven quantization, 16 frames
  dbscan         — DBSCAN segmentation, 16 frames
  velodyne32e    — uniform on the 32E uneven-CSV geometry, 16 frames
  velodynevlp16  — uniform on the VLP16 geometry, 16 frames

For each accuracy in {0.01, 0.02, 0.03, 0.04, 0.06} every frame is encoded
(rans and bzip2 byte sizes) and decoded, and the symmetric chamfer distance
+ F1(0.02) are computed against the frame's own back-projected grid cloud
(the reference's eval convention, tools/compress.py:183).  p2p/p2plane
PSNR (r=59.7, the reference's evaluate_metrics convention) is computed on
the first PSNR_FRAMES frames of each cell — each PSNR eval costs ~2.6 s of
1-core normals/NN work, so the full matrix would dominate the sweep; the
subset is disclosed in the json.  All configs run the SHIPPED defaults
otherwise (m8 transfer snap included — the quality a bare-flag user gets).

Writes RD_SWEEP.json and prints a markdown table per config (mean +- std,
worst case).  Accuracy is a traced argument, so each config's sweep reuses
one compiled program.
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
ACCURACIES = (0.01, 0.02, 0.03, 0.04, 0.06)
PSNR_FRAMES = 4  # per (config, accuracy) cell — see module docstring


def make_suite(pc: np.ndarray, n: int) -> list:
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


def chamfer_host(a: np.ndarray, b: np.ndarray, thr: float = 0.02) -> dict:
    """Exact symmetric chamfer + F1 via cKDTree — same math as
    metrics.chamfer.calc_chamfer_distance (strip zero-sum points, cd =
    (mean NN dist each way)/2, F1 at ``thr``), but host-side: the device
    chamfer jit is shape-keyed on the exact point counts, and this sweep's
    ~hundreds of distinct (n, m) pairs would each be a remote XLA compile
    on the tunneled rig."""
    from scipy.spatial import cKDTree

    a = a[np.sum(a, -1) != 0]
    b = b[np.sum(b, -1) != 0]
    d1 = cKDTree(b, balanced_tree=False).query(a, workers=-1)[0]
    d2 = cKDTree(a, balanced_tree=False).query(b, workers=-1)[0]
    precision = float((d2 < thr).mean())
    recall = float((d1 < thr).mean())
    f1 = (
        2 * precision * recall / (precision + recall)
        if precision + recall > 0
        else 0.0
    )
    return {"mean": (float(d1.mean()) + float(d2.mean())) / 2, "f_score": f1}


def sweep_config(name, lidar, cfg, frames, results):
    from rpcc_tpu.codec.bitstream import pack_bitstream
    from rpcc_tpu.codec.entropy import BasicCompressor
    from rpcc_tpu.models.pipeline import RPCCCodec

    codec = RPCCCodec(lidar, cfg)
    bz = BasicCompressor(method_name="bzip2")
    per_acc = {}
    for acc in ACCURACIES:
        codec.cfg = codec.cfg.replace(accuracy=acc)  # traced — no recompile
        step = codec.cfg.step
        bound = step + (0.0 if codec.cfg.uniform else max(codec.cfg.level_delta_acc))
        if codec.cfg.transfer_precision in ("u16", "i8", "m8"):
            bound += step / 16.0 / 2.0  # decode-side snap floor
        rows = []
        for i, pc in enumerate(frames):
            out = codec.encode_device(pc, seed=i)
            fields = codec.fields_from_device(out)
            blob = pack_bitstream(
                codec.entropy.compress_dict(fields), uniform=codec.cfg.uniform
            )
            blob_bz = pack_bitstream(
                bz.compress_dict(fields), uniform=codec.cfg.uniform
            )
            ri = np.asarray(out.range_image)
            n_pts = int((ri > 0).sum())
            pc_rec, ri_rec, _ = codec.decompress(blob)
            max_err = float(np.abs(ri_rec - ri).max())
            grid_pc = (ri[..., None] * codec.transform_map)[ri > 0]
            rec_pc = pc_rec[ri_rec > 0]
            res = chamfer_host(grid_pc, rec_pc.reshape(-1, 3))
            row = {
                "frame": i,
                "bpp": len(blob) * 8 / n_pts,
                "bpp_bzip2": len(blob_bz) * 8 / n_pts,
                "chamfer": float(res["mean"]),
                "f1_002": float(res["f_score"]),
                "max_err": max_err,
            }
            if i < PSNR_FRAMES:
                from rpcc_tpu.metrics.psnr import calc_point_to_point_plane_psnr

                p2p, p2pl = calc_point_to_point_plane_psnr(
                    grid_pc, rec_pc.reshape(-1, 3), out=False
                )
                row["p2p_psnr"] = float(p2p["psnr_mean"])
                row["p2plane_psnr"] = float(p2pl["psnr_mean"])
            rows.append(row)
            assert max_err <= bound + 1e-5, (
                f"bound violated: {name} acc={acc} frame {i}: "
                f"{max_err} > {bound}"
            )
        agg = {
            k: {
                "mean": float(np.mean([r[k] for r in rows])),
                "std": float(np.std([r[k] for r in rows])),
                "max": float(np.max([r[k] for r in rows])),
            }
            for k in ("bpp", "bpp_bzip2", "chamfer", "f1_002", "max_err")
        }
        for k in ("p2p_psnr", "p2plane_psnr"):
            vals = [r[k] for r in rows if k in r]
            agg[k] = {
                "mean": float(np.mean(vals)),
                "std": float(np.std(vals)),
                "min": float(np.min(vals)),
                "n_frames": len(vals),
            }
        per_acc[str(acc)] = agg
        a = agg
        print(
            f"{name} acc={acc}: bpp {a['bpp']['mean']:.3f}+-{a['bpp']['std']:.3f} "
            f"(max {a['bpp']['max']:.3f})  bzip2 {a['bpp_bzip2']['mean']:.3f}  "
            f"CD {a['chamfer']['mean']:.5f}+-{a['chamfer']['std']:.5f} "
            f"(max {a['chamfer']['max']:.5f})  F1 {a['f1_002']['mean']:.4f}  "
            f"PSNR {a['p2p_psnr']['mean']:.2f}/{a['p2plane_psnr']['mean']:.2f}",
            flush=True,
        )
    results[name] = {"n_frames": len(frames), "lidar": lidar.name,
                     "psnr_frames": PSNR_FRAMES, "per_acc": per_acc}


def main() -> None:
    from rpcc_tpu.config import CodecConfig, LidarConfig
    from rpcc_tpu.data import __lidar_cfg__
    from rpcc_tpu.data.pointcloud_io import load_point_cloud

    lidar64 = LidarConfig.from_yaml(__lidar_cfg__["Velodyne64E"], name="Velodyne64E")
    csv_32e = os.path.join(
        REPO, "rpcc_tpu/data/lidar_cfg",
        "example-Velodyne_HDL_32E_vertical_channel_distribution.csv",
    )
    lidar32 = LidarConfig.from_yaml(__lidar_cfg__["Velodyne32E"], csv_32e,
                                    name="Velodyne32E")
    lidar16 = LidarConfig.from_yaml(__lidar_cfg__["VelodyneVLP16"],
                                    name="VelodyneVLP16")
    pc0 = load_point_cloud(EXAMPLE).astype(np.float32)
    frames64 = make_suite(pc0, 32)
    from bench import synth_cloud_for

    frames32 = make_suite(synth_cloud_for(lidar32), 16)
    frames16 = make_suite(synth_cloud_for(lidar16), 16)

    results: dict = {}
    t_start = time.time()
    sweep_config("uniform_point", lidar64, CodecConfig(), frames64, results)
    sweep_config(
        "plane", lidar64, CodecConfig(modeling_method="plane"),
        frames64[:16], results,
    )
    sweep_config(
        "nonuniform", lidar64, CodecConfig(compress_framework="non-uniform"),
        frames64[:16], results,
    )
    sweep_config(
        "dbscan", lidar64, CodecConfig(segment_method="DBSCAN"),
        frames64[:16], results,
    )
    sweep_config("velodyne32e", lidar32, CodecConfig(), frames32, results)
    sweep_config("velodynevlp16", lidar16, CodecConfig(), frames16, results)

    with open(os.path.join(REPO, "RD_SWEEP.json"), "w") as f:
        json.dump(
            {
                "suite": "example.bin seeded warp+jitter+dropout (64E); "
                "ray-cast urban scene variants (32E)",
                "accuracies": list(ACCURACIES),
                "configs": results,
            },
            f,
            indent=1,
        )
    print(f"\nwrote RD_SWEEP.json in {time.time()-t_start:.0f}s")

    for name, r in results.items():
        print(f"\n### {name} ({r['n_frames']} frames, {r['lidar']})")
        print("| accuracy | bpp (rans) | bpp (bzip2) | chamfer (m) | F1@0.02 "
              "| p2p PSNR | p2plane PSNR |")
        print("|---|---|---|---|---|---|---|")
        for acc in ACCURACIES:
            a = r["per_acc"][str(acc)]
            print(
                f"| {acc} | {a['bpp']['mean']:.3f} ± {a['bpp']['std']:.3f} "
                f"(max {a['bpp']['max']:.3f}) | {a['bpp_bzip2']['mean']:.3f} | "
                f"{a['chamfer']['mean']:.4f} ± {a['chamfer']['std']:.4f} "
                f"(max {a['chamfer']['max']:.4f}) | {a['f1_002']['mean']:.4f} "
                f"| {a['p2p_psnr']['mean']:.2f} | {a['p2plane_psnr']['mean']:.2f} |"
            )


if __name__ == "__main__":
    main()
