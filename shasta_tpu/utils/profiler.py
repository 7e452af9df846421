"""Observability: profiler traces, per-stage timers, FLOPs estimation.

The reference ships none of this (SURVEY §5: only wall-clock FPS prints and
an unused flops counter); here tracing is first-class:

- :func:`trace`: context manager around jax.profiler (view in TensorBoard
  or xprof)
- :class:`StageTimer`: host-side named stage timing with summaries
- :func:`cost_analysis`: XLA's own FLOPs/bytes estimate for a jitted fn
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context: `with trace('/tmp/prof'): step()`."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region visible in profiler timelines (TraceAnnotation)."""
    return jax.profiler.TraceAnnotation(name)


class StageTimer:
    """Accumulating host-side stage timer.

    with timer.stage("voxelize"): ...
    print(timer.summary())
    """

    def __init__(self):
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str, block_on=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block_on is not None:
                jax.block_until_ready(block_on)
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> dict[str, dict]:
        return {
            k: {
                "total_s": round(self.totals[k], 4),
                "count": self.counts[k],
                "mean_ms": round(1e3 * self.totals[k] / max(self.counts[k], 1), 3),
            }
            for k in sorted(self.totals)
        }


def cost_analysis(fn, *args, **kwargs) -> dict:
    """XLA cost analysis (flops / bytes accessed) of jit(fn)(*args)."""
    lowered = jax.jit(fn).lower(*args, **kwargs)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0] if ca else {}
    return {
        "flops": ca.get("flops"),
        "bytes_accessed": ca.get("bytes accessed"),
        "optimal_seconds": ca.get("optimal_seconds"),
    }
