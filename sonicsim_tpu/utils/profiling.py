"""First-class tracing and per-stage timing.

The reference's only observability is wall-clock prints
(SonicSet_train.py:199,214-217); the TPU build makes profiling first-class
(SURVEY.md §5.1): ``StageTimer`` accumulates named stage timings (with
device sync) and ``trace`` wraps ``jax.profiler`` for on-demand TPU traces.
"""

from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict
from pathlib import Path

import jax


class StageTimer:
    """Accumulating per-stage wall-clock timer with device synchronization."""

    def __init__(self, sync: bool = True):
        self.sync = sync
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str, result=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if self.sync:
                try:
                    (jax.block_until_ready(result) if result is not None
                     else jax.effects_barrier())
                except Exception:
                    pass
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def time(self, name: str, fn, *args, **kwargs):
        """Run fn, blocking on its result, and record the stage."""
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        if self.sync:
            jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        self.totals[name] += dt
        self.counts[name] += 1
        return out

    def summary(self) -> dict:
        return {
            name: {
                "total_s": round(self.totals[name], 6),
                "count": self.counts[name],
                "mean_ms": round(1e3 * self.totals[name] / max(self.counts[name], 1), 3),
            }
            for name in sorted(self.totals)
        }

    def report(self) -> str:
        lines = [f"{'stage':<32} {'count':>6} {'mean ms':>10} {'total s':>9}"]
        for name, s in self.summary().items():
            lines.append(
                f"{name:<32} {s['count']:>6} {s['mean_ms']:>10.3f} {s['total_s']:>9.3f}"
            )
        return "\n".join(lines)

    def dump(self, path: str | Path) -> None:
        Path(path).parent.mkdir(parents=True, exist_ok=True)
        with open(path, "w") as f:
            json.dump(self.summary(), f, indent=2)


@contextlib.contextmanager
def trace(log_dir: str | Path = "/tmp/sonicsim_trace"):
    """Capture a jax.profiler trace (view with TensorBoard / xprof)."""
    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Named region that shows up in profiler traces."""
    with jax.profiler.TraceAnnotation(name):
        yield
