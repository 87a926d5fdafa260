"""Profiling & timing harness.

Replaces the reference's PROFILE_RT glFinish-bracketed host timers
(``Utils.hpp:27,41-45``; sync points all over ``Pipeline.inl``) with the
JAX equivalents: ``block_until_ready``-bracketed wall timers per stage
and `jax.profiler` traces for deep dives.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Callable

import jax


class StageTimers:
    """Accumulating per-stage wall timers (device-synced)."""

    def __init__(self):
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str, sync=None):
        t0 = time.perf_counter()
        yield
        if sync is not None:
            jax.block_until_ready(sync)
        dt = time.perf_counter() - t0
        self.totals[name] += dt
        self.counts[name] += 1

    def report(self) -> str:
        lines = []
        for name, total in sorted(self.totals.items(),
                                  key=lambda kv: -kv[1]):
            n = self.counts[name]
            lines.append(f"{name:24s} {total*1e3:9.1f} ms total  "
                         f"{total/n*1e3:8.2f} ms/call  x{n}")
        return "\n".join(lines)


def time_fn(fn: Callable, *args, warmup: int = 1, iters: int = 3,
            **kw) -> float:
    """Mean seconds per call after ``warmup`` compile/warm calls."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args, **kw))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


@contextlib.contextmanager
def trace(logdir: str = "/tmp/prismarine-trace"):
    """jax.profiler trace context (view with TensorBoard / xprof)."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()
