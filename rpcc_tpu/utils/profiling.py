"""Device-trace summarization (per-op timings with source attribution).

The reference prints host wall-clock per pipeline stage
(tools/compress.py:141-150); our stages fuse into one XLA program, so the
honest equivalent is a `jax.profiler` trace aggregated per op and mapped
back to the rpcc_tpu source line that emitted it.
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
from typing import List, Tuple


def summarize_trace(trace_dir: str, top: int = 15) -> List[Tuple[float, str, str]]:
    """Returns [(milliseconds, op name, source line)], biggest first."""
    paths = sorted(glob.glob(f"{trace_dir}/plugins/profile/*/*.trace.json.gz"))
    if not paths:
        return []
    with gzip.open(paths[-1]) as f:
        data = json.load(f)
    dur = collections.Counter()
    src = {}
    for e in data.get("traceEvents", []):
        if e.get("ph") == "X" and "dur" in e and not e.get("name", "").startswith("$"):
            name = e["name"]
            dur[name] += e["dur"]
            if "args" in e and "source" in e["args"]:
                src[name] = e["args"]["source"]
    return [(d / 1000.0, n, src.get(n, "")) for n, d in dur.most_common(top)]


def print_trace_summary(trace_dir: str, top: int = 15) -> None:
    rows = summarize_trace(trace_dir, top)
    if not rows:
        print("(no trace events captured)")
        return
    print("\nDevice op timings (one encode):")
    for ms, name, source in rows:
        print(f"    {ms:9.3f} ms  {name[:40]:42} {source}")
