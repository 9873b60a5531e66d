"""Single-frame compression CLI (reference ``tools/compress.py``).

Usage:
    python -m rpcc_tpu.cli.compress --input frame.bin --output frame.rpcc \
        --lidar Velodyne64E [--accuracy 0.02 --eval ...]
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np

from rpcc_tpu.cli.common import add_codec_args, config_from_args, lidar_from_args, print_args
from rpcc_tpu.data.pointcloud_io import load_point_cloud


def main() -> None:
    parser = argparse.ArgumentParser()
    add_codec_args(parser)
    parser.add_argument(
        "--profile", action="store_true",
        help="capture a device trace of one encode and print per-op timings.",
    )
    parser.add_argument(
        "--self_describing", action="store_true",
        help="prefix the bitstream with a config header so decompress needs "
        "no matching flags (the reference format is headerless).",
    )
    args = parser.parse_args()
    print_args(args)

    cfg = config_from_args(args)
    lidar = lidar_from_args(args)

    from rpcc_tpu.models.pipeline import RPCCCodec  # after backend env vars

    codec = RPCCCodec(lidar, cfg)

    # Warm-up pass so compile time is excluded (reference warms the CUDA
    # segmentation the same way, tools/compress.py:87-90).
    points = load_point_cloud(args.input)
    codec.compress(points)

    t_init = time.time()
    points = load_point_cloud(args.input)
    t_load = time.time()
    blob, fields, times = codec.compress(points)
    if args.self_describing:
        from rpcc_tpu.codec.bitstream import pack_header

        blob = pack_header(
            cfg.uniform, cfg.accuracy, cfg.segment_method, cfg.cluster_num,
            cfg.modeling_method, cfg.basic_compressor, args.lidar,
        ) + blob
    with open(args.output, "wb") as f:
        f.write(blob)
    t_save = time.time()

    print("\nCompression finished.")
    print("binary bitstream save in ", args.output)

    print("\nTime Cost:")
    print("    Load data: ", t_load - t_init)
    print("    Device encode (segment+model+predict+quantize+contour): ", times["device_encode"])
    print("    Field gather: ", times["gather_fields"])
    print("    Basic compressor module (", cfg.basic_compressor, "): ", times["entropy"])
    print("    Save binary file: ", times["framing"] + (t_save - t_load - sum(times.values())))
    print("    Total time cost: ", t_save - t_init)
    print("    Total time cost without loading data: ", t_save - t_load)

    if args.profile:
        import tempfile

        import jax

        from rpcc_tpu.utils.profiling import print_trace_summary

        with tempfile.TemporaryDirectory() as td:
            jax.profiler.start_trace(td)
            jax.block_until_ready(codec.encode_device(points))
            jax.profiler.stop_trace()
            print_trace_summary(td)

    # BPP accounting matches the reference (nonzero projected points,
    # tools/compress.py:152-155).  The residual stream covers exactly the
    # nonzero pixels (id-1 zero pixels are skipped), so its length IS the
    # point count — no extra device encode just to count pixels (a full
    # upload + graph + download of wasted wall-clock per CLI run).
    point_num = max(int(fields["residual_quantized"].size), 1)
    compressed_bit_size = os.path.getsize(args.output) * 8
    print("\nCompression Results: ")
    print("    Compression ratio: ", (point_num * 32 * 3) / compressed_bit_size)
    print("    BPP: ", compressed_bit_size / point_num)
    print("\n")

    if args.eval:
        # eval compares against the encoder's own range image — one extra
        # device encode here, but only when --eval asks for it.
        out = codec.encode_device(points)
        ri = np.asarray(out.range_image)
        with open(args.output, "rb") as f:
            blob = f.read()
        pc_rec, ri_rec, _ = codec.decompress(blob)
        range_dif = np.abs(ri_rec - ri)
        max_depth_error = float(range_dif.max())
        mean_depth_error = float(range_dif.mean())
        bound = cfg.step + (0.0 if cfg.uniform else max(cfg.level_delta_acc))
        if max_depth_error > bound + 1e-5:
            raise AssertionError(
                f"Reconstruction error {max_depth_error} exceeds bound {bound}"
            )

        from rpcc_tpu.metrics import calc_chamfer_distance, calc_point_to_point_plane_psnr

        pc_grid = np.asarray(out.range_image)[..., None] * codec.transform_map
        cd = calc_chamfer_distance(pc_grid.reshape(-1, 3), pc_rec.reshape(-1, 3), out=False)
        p2p, p2pl = calc_point_to_point_plane_psnr(
            pc_grid.reshape(-1, 3), pc_rec.reshape(-1, 3), out=False
        )
        print("\nReconstruction quality: ")
        print("    Depth Error (mean): ", mean_depth_error)
        print("    Depth Error (max): ", max_depth_error)
        print("    Chamfer Distance (mean): ", cd["mean"])
        print("    F1 score (threshold=0.02): ", cd["f_score"])
        print("    Point-to-Point PSNR (r=59.7): ", p2p["psnr_mean"])
        print("    Point-to-Plane PSNR (r=59.7): ", p2pl["psnr_mean"])


if __name__ == "__main__":
    main()
