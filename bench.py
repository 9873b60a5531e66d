"""Benchmark: the BASELINE.json configs + decode, on real hardware.

Emits one JSON line per configuration (flushed as each completes) and
re-prints the headline line (config 1: uniform/point/FPS, default entropy
coder) LAST so drivers that parse the final line get the headline metric.

Round-3 lines:
  1. kitti64e_e2e_encode_*        — config 1 e2e across transfer modes
     (u16 / i8 / m8+device-entropy flagship), device-only fps, bpp (rans)
     + reference-parity bzip2 bpp, max-depth-error guardrail
  2. kitti64e_e2e_decode_*        — device decode e2e (u16 downlink) and
     the native host decoder (wire-free direction)
  3. kitti64e_plane / nonuniform / dbscan — e2e + device fps + bpp per
     BASELINE config (DBSCAN segment method included)
  4. velodyne32e / vlp16          — multi-LiDAR geometries, 32E e2e
     exercises the uneven-CSV channel table end-to-end
  5. kitti64e_datalist_e2e        — datalist pipeline incl. disk IO
     (prefetcher + lean loader + flagship engine)

HEADLINE POLICY (VERDICT r2 #3): the parsed ``value`` is the MEDIAN of
>= 3 sustained windows measured back-to-back at the end of the run; every
window is disclosed in named fields.  This rig's tunnel throughput drifts
tens of percent over minutes — medians, not best-of, are the defensible
claim.

vs_baseline: the reference implementation runs single-digit fps end-to-end
on its GPU-assisted path (BASELINE.md); 5 frames/s is the denominator.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

BASELINE_FPS = 5.0
EXAMPLE = "/root/reference/assets/example_data/example.bin"
BATCH = 64  # amortizes per-call dispatch/roundtrip latency (A/B: +11-18% vs 32)
BATCHES_TIMED = 6
WALL_WINDOW_S = 30.0
HEADLINE_WINDOWS = 3


def emit(obj) -> None:
    print(json.dumps(obj), flush=True)


def device_fps(engine, dev_args, n_chips: int, reps: int = 6) -> float:
    """Sustained device throughput: queue all reps (async dispatch overlaps
    the per-call host/tunnel latency, exactly like the production pipeline)
    and block once at the end."""
    import jax

    def call():
        return engine._encode_b(*dev_args)

    jax.block_until_ready(call())
    t0 = time.perf_counter()
    out = None
    for _ in range(reps):
        out = call()
    jax.block_until_ready(out)
    return reps * dev_args[0].shape[0] / (time.perf_counter() - t0) / n_chips


def _device_args(engine, clouds):
    """Upload one stacked batch; returns the positional args of _encode_b."""
    import jax

    pts, seeds, tail, _ = engine._prepare_batch(
        clouds, seeds=range(engine.batch_size)
    )
    return tuple(jax.device_put(a) for a in (pts, seeds, engine._step_arg, *tail))


def bench_config(name, lidar, cfg, pc, n_chips, e2e=False, extra=None, batch=None):
    """Device fps (+ optional e2e fps) and quality guardrails for one config."""
    import jax

    from rpcc_tpu.parallel import BatchEngine

    engine = BatchEngine(lidar, cfg, batch_size=batch or BATCH, workers=8)
    clouds = [pc] * engine.batch_size
    results = engine.encode_frames(clouds, seeds=range(engine.batch_size))  # warm-up
    blob0 = results[0][0]

    dev_args = _device_args(engine, clouds)
    dev_fps = device_fps(engine, dev_args, n_chips)

    out = jax.block_until_ready(engine._encode_b(*dev_args))
    ri = np.asarray(out.range_image[0])
    n_pts = max(int((ri > 0).sum()), 1)
    bpp = len(blob0) * 8 / n_pts

    dec = engine.decode_blobs([blob0])
    rec_ri = np.linalg.norm(dec[0], axis=-1)
    bound = cfg.step + (0.0 if cfg.uniform else max(cfg.level_delta_acc))
    if cfg.transfer_precision in ("u16", "i8", "m8"):
        bound += cfg.step / 16.0 / 2.0  # decode-side snap floor
    max_err = float(np.abs(rec_ri - ri).max())

    line = {
        "metric": name,
        "value": round(dev_fps, 1),
        "unit": "frames/s/chip(device)",
        "vs_baseline": round(dev_fps / BASELINE_FPS, 3),
        "bpp": round(bpp, 4),
        "max_depth_err": round(max_err, 5),
        "err_bound": round(bound + 1e-5, 5),
        "chips": n_chips,
    }
    if extra:
        line.update(extra)

    if e2e:
        # warm the jittered-content programs: each variant batch can land in
        # a DIFFERENT i8 exception bucket (m=8192 vs 12288 — distinct
        # programs), and configs 2/3/3b are single-window measurements — a
        # mid-window remote XLA compile wrecks them.  Warm every variant
        # measure_e2e will replay (the DBSCAN line read 63 fps with a
        # one-variant warm vs 97-119 once actually warm).
        for v in _jittered_variants(pc, 8):
            engine.encode_frames(
                [v] * engine.batch_size, seeds=range(engine.batch_size)
            )
        fps = measure_e2e(engine, pc, n_chips)
        line["value"] = round(fps, 3)
        line["unit"] = "frames/s/chip"
        line["vs_baseline"] = round(fps / BASELINE_FPS, 3)
        line["device_only_fps"] = round(dev_fps, 1)

    return line, engine, blob0, ri


def measure_e2e(engine, pc, n_chips: int) -> float:
    """Median steady-state pipelined encode rate over one wall window.

    Distinct per-batch content (pre-jittered variants) so no transfer
    caching can flatter the numbers; 3-thread pipeline (upload k /
    download k-1 / entropy k-2)."""
    variants = _jittered_variants(pc, 8)
    t_start = time.perf_counter()

    def batch_gen():
        k = 0
        while k < BATCHES_TIMED or (
            time.perf_counter() - t_start < WALL_WINDOW_S and k < 30
        ):
            yield [variants[k % len(variants)]] * engine.batch_size, range(
                k * engine.batch_size, (k + 1) * engine.batch_size
            )
            k += 1

    arrivals = []
    for _results in engine.encode_pipeline(batch_gen()):
        arrivals.append(time.perf_counter())
    # Steady-state rate = batches completed per wall second between the
    # first and last arrival (the first absorbs the pipeline fill).  NOT a
    # median of inter-arrival gaps: queued batches drain in bunches when
    # the device is the bottleneck, which makes gap medians wildly
    # overestimate a slow graph.
    if len(arrivals) < 2:
        return 0.0
    span = arrivals[-1] - arrivals[0]
    return (len(arrivals) - 1) * engine.batch_size / span / n_chips if span > 0 else 0.0


def _jittered_variants(pc: np.ndarray, k: int):
    """k distinct clouds (1 mm jitter on the clean frame): enough to defeat
    any content/identity caching on the transfer path while keeping the
    workload the same scale."""
    rng = np.random.default_rng(1234)
    return [
        (pc + rng.normal(0, 0.001, pc.shape)).astype(np.float32) for _ in range(k)
    ]


def _decode_batches(engine, pc, k=3):
    """Distinct frames AND distinct batches so transfer caching can't
    flatter decode numbers."""
    clouds = [v for v in _jittered_variants(pc, 8) for _ in range(8)][: engine.batch_size]
    return [
        [
            b
            for b, _ in engine.encode_frames(
                clouds, seeds=range(j * engine.batch_size, (j + 1) * engine.batch_size)
            )
        ]
        for j in range(k)
    ]


def measure_decode(engine, dec_batches, n_chips, reps=12) -> float:
    """Steady-state pipelined decode rate: batches per wall second between
    the first and last arrival — the first absorbs the 4-deep pipeline
    fill, mirroring measure_e2e's encode accounting (total-time/total-n
    understated the 4-stage pipeline ~25% at 8 reps)."""
    engine.decode_blobs(dec_batches[0])  # warm
    arrivals = []
    for _recs in engine.decode_pipeline(
        dec_batches[k % len(dec_batches)] for k in range(reps)
    ):
        arrivals.append(time.perf_counter())
    if len(arrivals) < 2:
        return 0.0
    span = arrivals[-1] - arrivals[0]
    return (len(arrivals) - 1) * engine.batch_size / span / n_chips if span > 0 else 0.0


def main() -> None:
    import jax

    from rpcc_tpu.config import CodecConfig, LidarConfig
    from rpcc_tpu.data import __lidar_cfg__, __lidar_csv__
    from rpcc_tpu.data.pointcloud_io import load_point_cloud

    lidar64 = LidarConfig.from_yaml(__lidar_cfg__["Velodyne64E"], name="Velodyne64E")
    pc = load_point_cloud(EXAMPLE).astype(np.float32)
    # Every bench engine is built WITHOUT a mesh, so all work runs on one
    # chip regardless of how many devices the runtime exposes — per-chip
    # normalization is therefore /1, not /len(jax.devices()) (which would
    # understate every number on a multi-device image).
    n_chips = 1
    variants = _jittered_variants(pc, 8)

    # ---- config 1 (headline): uniform / point / FPS / default coder (rans)
    # flagship transfer mode: m8 (packed nonzero mask + compact i8 deltas)
    # uplink + on-device rANS entropy.  A/B vs i8 on this rig (7 paired
    # windows): m8 median 136 vs 129 fps e2e, uplink 8.36 vs 11.34
    # MB/batch-64; m8 wins 6/7 pairs (wire-bound rig).  i8 keeps its own
    # line below for cross-round comparability.
    cfg_flag = CodecConfig(transfer_precision="m8", device_entropy=True)
    head, engine_flag, blob1, ri1 = bench_config(
        "kitti64e_e2e_encode_throughput_acc0.02_rans",
        lidar64, cfg_flag, pc, n_chips, e2e=True,
        extra={"transfer": "m8", "entropy": "device"},
    )
    # reference-parity coder's bpp for the same frame: device-entropy
    # engines carry only host-visible fields, so re-encode the frame on a
    # host-entropy engine for the bzip2 comparison
    from rpcc_tpu.codec.bitstream import pack_bitstream
    from rpcc_tpu.codec.entropy import BasicCompressor

    cfg1 = CodecConfig()
    from rpcc_tpu.parallel import BatchEngine

    eng_host = BatchEngine(lidar64, cfg1, batch_size=8, workers=8)
    fields_h = eng_host.encode_frames([pc], seeds=[0])[0][1]
    bz = BasicCompressor(method_name="bzip2")
    n_pts = max(int((ri1 > 0).sum()), 1)
    head["bpp_bzip2"] = round(
        len(pack_bitstream(bz.compress_dict(fields_h), uniform=True)) * 8 / n_pts, 4
    )
    emit(head)

    # ---- i8 / u16 transfer modes (continuity with r1/r2 metric names)
    line_i8, _, _, _ = bench_config(
        "kitti64e_e2e_encode_i8_transfer_acc0.02_rans",
        lidar64, CodecConfig(transfer_precision="i8", device_entropy=True),
        pc, n_chips, e2e=True, extra={"transfer": "i8", "entropy": "device"},
    )
    emit(line_i8)
    line16, _, _, _ = bench_config(
        "kitti64e_e2e_encode_u16_transfer_acc0.02_rans",
        lidar64, CodecConfig(transfer_precision="u16", device_entropy=True),
        pc, n_chips, e2e=True, extra={"transfer": "u16", "entropy": "device"},
    )
    emit(line16)

    # ---- decode: device pipeline (i8 row-delta downlink — metric name
    # keeps the r1/r2 "u16_transfer" label for cross-round comparability;
    # the downlink wire view is recorded in the "transfer" field) + native
    # host decoder
    dec_batches = _decode_batches(engine_flag, pc)
    dec_dev = measure_decode(engine_flag, dec_batches, n_chips)
    rec_ri = np.linalg.norm(engine_flag.decode_blobs([blob1])[0], axis=-1)
    delta_dec = float(cfg1.step) / 16.0
    emit(
        {
            "metric": "kitti64e_e2e_decode_u16_transfer_acc0.02_rans",
            "value": round(dec_dev, 3),
            "unit": "frames/s/chip",
            "vs_baseline": round(dec_dev / BASELINE_FPS, 3),
            "max_depth_err": round(float(np.abs(rec_ri - ri1).max()), 5),
            "err_bound": round(cfg1.step + delta_dec / 2 + 1e-5, 5),
            "transfer": "m8-up/m8-down",
            "chips": n_chips,
        }
    )

    from rpcc_tpu.models.host_decoder import HostDecoder

    hd = HostDecoder(lidar64, cfg_flag)
    hd.decode_blobs_points(dec_batches[0][:8])  # warm native lib
    t0 = time.perf_counter()
    n_dec = 0
    for k in range(8):
        n_dec += len(hd.decode_blobs_points(dec_batches[k % len(dec_batches)]))
    host_dec = n_dec / (time.perf_counter() - t0)
    ri_host = hd.decode_blobs([blob1])[0]
    emit(
        {
            "metric": "kitti64e_e2e_decode_host_native_acc0.02_rans",
            "value": round(host_dec, 3),
            "unit": "frames/s (host, no device)",
            "vs_baseline": round(host_dec / BASELINE_FPS, 3),
            "max_depth_err": round(float(np.abs(ri_host - ri1).max()), 5),
            "err_bound": round(cfg1.step + 1e-5, 5),
            "backend": "host",
            "chips": 0,
        }
    )

    # ---- config 2: plane modeling (e2e + device)
    line, _, _, _ = bench_config(
        "kitti64e_plane_modeling_acc0.02", lidar64,
        CodecConfig(modeling_method="plane", transfer_precision="i8",
                    device_entropy=True),
        pc, n_chips, e2e=True, extra={"transfer": "i8", "entropy": "device"},
    )
    emit(line)

    # ---- config 3: non-uniform (salience) quantization (e2e + device)
    line, _, _, _ = bench_config(
        "kitti64e_nonuniform_acc0.02", lidar64,
        CodecConfig(compress_framework="non-uniform", transfer_precision="i8",
                    device_entropy=True),
        pc, n_chips, e2e=True, extra={"transfer": "i8", "entropy": "device"},
    )
    emit(line)

    # ---- config 3b: DBSCAN segmentation (e2e + device)
    line, _, _, _ = bench_config(
        "kitti64e_dbscan_acc0.02", lidar64,
        CodecConfig(segment_method="DBSCAN", transfer_precision="i8",
                    device_entropy=True),
        pc, n_chips, e2e=True, extra={"transfer": "i8", "entropy": "device",
                                      "segment": "DBSCAN"},
    )
    emit(line)

    # ---- config 4: multi-LiDAR geometries (32E + VLP16); the 32E line
    # runs e2e WITH the example per-channel CSV (uneven vertical channels),
    # exercising the nearest-angle row table through the full
    # host-projection + device pipeline (the registry default is None,
    # matching the reference's dataset/__init__.py:29-37)
    csv_32e = os.path.join(
        REPO, "rpcc_tpu/data/lidar_cfg",
        "example-Velodyne_HDL_32E_vertical_channel_distribution.csv",
    )
    for name, csv, e2e_on in (
        ("Velodyne32E", csv_32e, True),
        ("VelodyneVLP16", None, False),
    ):
        lidar = LidarConfig.from_yaml(__lidar_cfg__[name], csv, name=name)
        pcl = synth_cloud_for(lidar)
        line, _, _, _ = bench_config(
            f"{name.lower()}_uniform_acc0.02", lidar,
            CodecConfig(transfer_precision="u16", device_entropy=True),
            pcl, n_chips, e2e=e2e_on,
            extra={"channels": "csv" if not lidar.even_dist else "even"},
        )
        emit(line)

    # ---- config 5: datalist pipeline including disk IO + .rpcc writes
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        files = []
        for i in range(BATCH * 12):  # amortize the 4-deep pipeline's fill+drain
            p = os.path.join(td, f"frames/{i:06d}.bin")
            os.makedirs(os.path.dirname(p), exist_ok=True)
            v = variants[i % len(variants)]
            np.concatenate([v, np.zeros((v.shape[0], 1), np.float32)], -1).tofile(p)
            files.append(p)
        from rpcc_tpu.cli.compress_datalist import output_path_for
        from rpcc_tpu.data.pointcloud_io import load_point_cloud_f32
        from rpcc_tpu.parallel import prefetch_loaded_batches

        # untimed warm pass: spins up the pipeline threads, output dirs and
        # page cache so rep 0 measures the pipeline, not process warm-up
        warm_gen = prefetch_loaded_batches(
            files[:BATCH], BATCH, lambda i: load_point_cloud_f32(files[i]), workers=8
        )
        for results in engine_flag.encode_pipeline(warm_gen):
            for (blob, _f), name in zip(results, files[:BATCH]):
                with open(output_path_for(name, td + "/warm", "rpcc"), "wb") as f:
                    f.write(blob)
        dl_rates = []
        for rep in range(3):
            t0 = time.perf_counter()
            done = 0
            dl_gen = prefetch_loaded_batches(
                files, BATCH, lambda i: load_point_cloud_f32(files[i]), workers=8,
                depth=2,
            )
            name_chunks = [files[s : s + BATCH] for s in range(0, len(files), BATCH)]
            for chunk, results in zip(name_chunks, engine_flag.encode_pipeline(dl_gen)):
                for (blob, _f), name in zip(results, chunk):
                    with open(
                        output_path_for(name, td + f"/out{rep}", "rpcc"), "wb"
                    ) as f:
                        f.write(blob)
                    done += 1
            dl_rates.append(done / (time.perf_counter() - t0) / n_chips)
        dl_rates.sort()
        dl_fps = dl_rates[len(dl_rates) // 2]
    emit(
        {
            "metric": "kitti64e_datalist_e2e_acc0.02_rans",
            "value": round(dl_fps, 3),
            "unit": "frames/s/chip",
            "vs_baseline": round(dl_fps / BASELINE_FPS, 3),
            "frames": len(files),
            "windows": [round(r, 1) for r in dl_rates],
            "transfer": "m8",
            "entropy": "device",
            "chips": n_chips,
        }
    )

    # Headline last: drivers that parse the final line get it.  MEDIAN of
    # >= 3 sustained windows, ALL measured back-to-back here at the end of
    # the run (everything warm), all windows disclosed — the tunneled rig
    # drifts tens of percent over minutes, so a median of same-regime
    # windows, not a best-of or a mix with the run-start figure, is the
    # defensible claim.  The run-start window stays as a named field.
    head["first_config_window_fps"] = float(head["value"])
    windows = [measure_e2e(engine_flag, pc, n_chips) for _ in range(HEADLINE_WINDOWS)]
    ordered = sorted(windows)
    med = ordered[len(ordered) // 2]
    head["value"] = round(med, 3)
    head["vs_baseline"] = round(med / BASELINE_FPS, 3)
    head["windows_fps"] = [round(w, 3) for w in windows]
    head["best_window_fps"] = round(ordered[-1], 3)
    head["config"] = "device_entropy+m8"
    emit(head)


def synth_cloud_for(lidar, seed=0):
    """A smooth urban-like scene rendered onto the lidar's own scan grid
    (Oxford/HKUST datasets are not on this rig): ground plane + surrounding
    building walls + a few boxes, ~1cm surface noise — residuals compress
    like real scans, unlike white-noise blobs."""
    rng = np.random.default_rng(seed)
    H, W = lidar.height, lidar.width
    from rpcc_tpu.ops.projection import build_transform_map

    tm = build_transform_map(lidar).reshape(-1, 3)  # unit rays
    # ray-cast: ground plane z=-1.8 and a circular "wall" at radius r(az)
    tz = tm[:, 2]
    with np.errstate(divide="ignore"):
        r_ground = np.where(tz < -1e-4, -1.8 / tz, np.inf)
    az = np.arctan2(tm[:, 1], tm[:, 0])
    wall_r = 18 + 8 * np.sin(3 * az) + 3 * np.sin(7 * az + 1.0)
    horiz = np.linalg.norm(tm[:, :2], axis=-1)
    with np.errstate(divide="ignore"):
        r_wall = np.where(horiz > 1e-4, wall_r / horiz, np.inf)
    r = np.minimum(r_ground, r_wall)
    r = np.where(np.isfinite(r) & (r > 2.0) & (r < 80.0), r, 0.0)
    r = (r + rng.normal(0, 0.01, r.shape) * (r > 0)).astype(np.float32)
    pts = tm * r[:, None]
    return pts[r > 0].astype(np.float32)


if __name__ == "__main__":
    main()
