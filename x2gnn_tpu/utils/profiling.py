"""Profiling and throughput accounting.

The reference has no profiler at all (SURVEY §5: only wall-clock deltas and
a peak-CUDA-memory print, train_ema.py:59). Here: `trace` wraps
jax.profiler for TensorBoard-viewable device traces; StepTimer/Throughput
provide per-step timing and the BASELINE.md north-star counters
(edges/s/chip, molecules/s).
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler device trace into `logdir`."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock per-step timing with warmup discard."""

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self.times = []
        self._t0: Optional[float] = None
        self._count = 0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self._count += 1
        if self._count > self.warmup:
            self.times.append(dt)

    @property
    def mean(self) -> float:
        return sum(self.times) / max(len(self.times), 1)


class Throughput:
    """North-star counters: edges/s/chip, triplets/s/chip, molecules/s."""

    def __init__(self, edges_per_batch: int, triplets_per_batch: int,
                 molecules_per_batch: int, num_chips: int = 1):
        self.e = edges_per_batch
        self.t = triplets_per_batch
        self.m = molecules_per_batch
        self.chips = max(num_chips, 1)

    def rates(self, seconds_per_step: float) -> Dict[str, float]:
        s = max(seconds_per_step, 1e-12)
        return {
            "edges_per_sec_per_chip": self.e / s / self.chips,
            "triplets_per_sec_per_chip": self.t / s / self.chips,
            "molecules_per_sec": self.m / s,
            "seconds_per_step": seconds_per_step,
        }
