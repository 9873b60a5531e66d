"""Stage timing + profiling hooks.

The reference prints per-stage ``time.time()`` deltas (tools/compress.py:
141-150).  Here: a StageTimer with the same reporting, plus optional
``jax.profiler`` trace capture around any region for real device timelines
(xprof), since a fused XLA program can't be split by host timers.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional


class StageTimer:
    def __init__(self):
        self.durations: Dict[str, float] = {}
        self._t = time.perf_counter()

    def mark(self, stage: str) -> float:
        now = time.perf_counter()
        dt = now - self._t
        self.durations[stage] = self.durations.get(stage, 0.0) + dt
        self._t = now
        return dt

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        yield
        self.durations[name] = self.durations.get(name, 0.0) + time.perf_counter() - t0

    def report(self, prefix: str = "    ") -> str:
        lines = [f"{prefix}{k}: {v:.6f}s" for k, v in self.durations.items()]
        total = sum(self.durations.values())
        lines.append(f"{prefix}total: {total:.6f}s")
        return "\n".join(lines)


@contextlib.contextmanager
def device_trace(log_dir: Optional[str] = None):
    """Capture a jax.profiler trace (view with xprof/tensorboard)."""
    if log_dir is None:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
