"""Timers — ≙ reference ``lib/utils/timer.py`` plus jax-aware helpers."""

from __future__ import annotations

import time


class Timer:
    """Wall-clock accumulator with the reference's API (tic/toc/average_time)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.total_time = 0.0
        self.calls = 0
        self.start_time = 0.0
        self.diff = 0.0
        self.average_time = 0.0

    def tic(self):
        self.start_time = time.perf_counter()

    def toc(self, average: bool = True) -> float:
        self.diff = time.perf_counter() - self.start_time
        self.total_time += self.diff
        self.calls += 1
        self.average_time = self.total_time / self.calls
        return self.average_time if average else self.diff


def device_timer(fn, *args, iters: int = 10, warmup: int = 2) -> float:
    """Median seconds per call, bracketed by block_until_ready.

    NOTE: only meaningful on backends where block_until_ready actually blocks
    (local CPU/TPU).  On the remote-tunnel platform use the chained-loop
    technique in bench.py instead.
    """
    import jax

    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]
