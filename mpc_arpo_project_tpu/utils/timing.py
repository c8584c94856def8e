"""Timing / profiling harness (SURVEY §5.1 — the reference has none; solves/s
and p50 latency are first-class metrics here).

On the remote-attached TPU backend, ``block_until_ready`` does not actually
synchronize — only a device-to-host transfer does — so :func:`device_time`
forces a tiny result materialization. ``profile_trace`` wraps
``jax.profiler`` for TensorBoard-compatible traces.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import numpy as np
import jax


def device_time(fn: Callable, *args, reps: int = 3, warmup: int = 1, **kw) -> float:
    """Median wall time of ``fn(*args)`` with forced device synchronization.

    The sync is a host transfer of one leaf's first element (cheap), because
    ``block_until_ready`` is unreliable through the remote tunnel."""

    def sync(out):
        leaf = jax.tree.leaves(out)[0]
        np.asarray(jax.tree.map(lambda x: x, leaf)).ravel()[:1]

    for _ in range(warmup):
        sync(fn(*args, **kw))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(fn(*args, **kw))
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


class Timer:
    """Accumulating section timer for host-side orchestration code."""

    def __init__(self):
        self.acc = {}

    @contextlib.contextmanager
    def section(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.acc[name] = self.acc.get(name, 0.0) + time.perf_counter() - t0

    def report(self) -> str:
        total = sum(self.acc.values()) or 1.0
        lines = [
            f"{k:>24}: {v:8.3f}s ({100*v/total:5.1f}%)"
            for k, v in sorted(self.acc.items(), key=lambda kv: -kv[1])
        ]
        return "\n".join(lines)


@contextlib.contextmanager
def profile_trace(log_dir: str = "/tmp/jax_trace"):
    """jax.profiler trace context (view with TensorBoard)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
