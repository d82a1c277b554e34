"""Timing harness for device-synchronized benchmarks.

The reference has no profiling beyond tqdm wall-clock. Here: a
``block_until_ready``-synchronized timer and a throughput helper used by
``bench.py`` to measure the north-star metric (query points/sec/chip).
``jax.profiler.trace`` can wrap any Timer region for xprof dumps.
"""

from __future__ import annotations

import time
from typing import Callable

import jax

__all__ = ["Timer", "throughput"]


class Timer:
    """Context manager: device-synchronized wall time in .seconds."""

    def __init__(self, sync_on=None):
        self._sync_on = sync_on
        self.seconds = 0.0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        if self._sync_on is not None:
            jax.block_until_ready(self._sync_on)
        self.seconds = time.perf_counter() - self._t0
        return False


def throughput(fn: Callable, *args, iters: int = 20, warmup: int = 3):
    """Time a jitted fn; returns (seconds_per_call, result).

    Synchronizes on the result each call; warmup covers compilation.
    """
    result = None
    for _ in range(warmup):
        result = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        result = jax.block_until_ready(fn(*args))
    dt = (time.perf_counter() - t0) / iters
    return dt, result
