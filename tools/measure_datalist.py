"""Focused datalist-throughput measurement (real TPU): bench.py config 5 only.

Round-3 work item: datalist >= 100 fps/chip via the background prefetcher
(parallel/prefetch.py) + lean f32 loader.  Prints per-window fps.
"""

import os
import sys
import tempfile
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench import BATCH, EXAMPLE, _jittered_variants  # noqa: E402


def main() -> None:
    import jax

    from rpcc_tpu.config import CodecConfig, LidarConfig
    from rpcc_tpu.data import __lidar_cfg__
    from rpcc_tpu.data.pointcloud_io import load_point_cloud, load_point_cloud_f32
    from rpcc_tpu.parallel import BatchEngine, prefetch_loaded_batches
    from rpcc_tpu.cli.compress_datalist import output_path_for

    lidar64 = LidarConfig.from_yaml(__lidar_cfg__["Velodyne64E"], name="Velodyne64E")
    pc = load_point_cloud(EXAMPLE).astype(np.float32)
    n_chips = max(1, len(jax.devices()))
    engine = BatchEngine(
        lidar64,
        CodecConfig(transfer_precision="u16", device_entropy=True),
        batch_size=BATCH,
        workers=8,
    )
    print("warming...", flush=True)
    t0 = time.perf_counter()
    engine.encode_frames([pc] * BATCH, seeds=range(BATCH))
    print(f"warm done in {time.perf_counter() - t0:.1f}s", flush=True)

    with tempfile.TemporaryDirectory() as td:
        files = []
        dl_variants = _jittered_variants(pc, 8)
        for i in range(BATCH * 6):
            p = os.path.join(td, f"frames/{i:06d}.bin")
            os.makedirs(os.path.dirname(p), exist_ok=True)
            v = dl_variants[i % len(dl_variants)]
            np.concatenate([v, np.zeros((v.shape[0], 1), np.float32)], -1).tofile(p)
            files.append(p)
        os.system("sync")

        for rep in range(3):
            t0 = time.perf_counter()
            done = 0
            gen = prefetch_loaded_batches(
                files, BATCH, lambda i: load_point_cloud_f32(files[i]), workers=4
            )
            name_chunks = [files[s : s + BATCH] for s in range(0, len(files), BATCH)]
            arrivals = []
            for chunk, results in zip(name_chunks, engine.encode_pipeline(gen)):
                for (blob, _f), name in zip(results, chunk):
                    with open(output_path_for(name, td + f"/out{rep}", "rpcc"), "wb") as f:
                        f.write(blob)
                    done += 1
                arrivals.append(time.perf_counter())
            dt = time.perf_counter() - t0
            deltas = [b - a for a, b in zip(arrivals, arrivals[1:])]
            print(
                f"rep {rep}: {done} frames in {dt:.2f}s = {done / dt / n_chips:.1f} fps/chip; "
                f"per-batch fps: {[round(BATCH / d, 1) for d in deltas]}",
                flush=True,
            )


if __name__ == "__main__":
    main()
