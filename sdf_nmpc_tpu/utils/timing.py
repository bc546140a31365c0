"""Timing / profiling helpers.

The reference exposes one solver stat (acados ``time_tot``, ocp.py:170) and
ad-hoc prints (SURVEY.md §5.1).  Here: a stopwatch for host-side stage timing,
a jax.profiler trace context, and a throughput meter for batched solves.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Optional

import numpy as np


class Stopwatch:
    """Accumulating named stage timer (blocks on device results if asked)."""

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str, block_on=None):
        t0 = time.perf_counter()
        yield
        if block_on is not None:
            import jax

            for leaf in jax.tree.leaves(block_on):
                if hasattr(leaf, "block_until_ready"):
                    leaf.block_until_ready()
        self.totals[name] += time.perf_counter() - t0
        self.counts[name] += 1

    def summary(self) -> dict:
        return {
            name: {"total_s": t, "count": self.counts[name], "mean_ms": 1e3 * t / self.counts[name]}
            for name, t in self.totals.items()
        }


@contextlib.contextmanager
def device_trace(log_dir: str):
    """jax.profiler trace context (view with TensorBoard / xprof)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class ThroughputMeter:
    """solves/s + latency percentiles over repeated batched solves."""

    def __init__(self, batch: int):
        self.batch = batch
        self.times: list[float] = []

    @contextlib.contextmanager
    def step(self, block_on=None):
        t0 = time.perf_counter()
        yield
        if block_on is not None:
            import jax

            leaves = jax.tree.leaves(block_on)
            if leaves and hasattr(leaves[0], "block_until_ready"):
                leaves[0].block_until_ready()
        self.times.append(time.perf_counter() - t0)

    def stats(self) -> dict:
        t = np.asarray(self.times)
        med = float(np.median(t))
        return {
            "steps": len(t),
            "median_step_ms": 1e3 * med,
            "p99_step_ms": float(np.percentile(t, 99)) * 1e3,
            "solves_per_s": self.batch / med,
        }
