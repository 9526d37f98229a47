"""Profiling: jax.profiler traces + throughput meters.

The reference's only observability is wall-clock prints (SURVEY.md §5.1).
Here: `trace(dir)` records an XLA/TPU trace viewable in TensorBoard or
Perfetto; `ThroughputMeter` turns step timings into audio-sec/sec and
steps/sec; `estimate_cost` reports XLA's own FLOP/bytes estimates for a
jitted function (useful for speed-of-light comparisons).
"""
from __future__ import annotations

import contextlib
import time

import jax
import numpy as np

from .timing import force


@contextlib.contextmanager
def trace(log_dir: str):
    """Record a profiler trace around the with-block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class ThroughputMeter:
    """Audio-seconds-per-second + steps/s over a sliding window."""

    def __init__(self, window: int = 50):
        self.window = window
        self._times: list = []
        self._audio: list = []

    def step(self, audio_seconds: float = 0.0):
        self._times.append(time.perf_counter())
        self._audio.append(audio_seconds)
        if len(self._times) > self.window + 1:
            self._times.pop(0)
            self._audio.pop(0)

    @property
    def steps_per_sec(self) -> float:
        if len(self._times) < 2:
            return 0.0
        return (len(self._times) - 1) / (self._times[-1] - self._times[0])

    @property
    def audio_sec_per_sec(self) -> float:
        if len(self._times) < 2:
            return 0.0
        return sum(self._audio[1:]) / (self._times[-1] - self._times[0])


def estimate_cost(fn, *args) -> dict:
    """XLA cost analysis of a jitted callable on concrete args."""
    lowered = jax.jit(fn).lower(*args)
    cost = lowered.compile().cost_analysis()
    if isinstance(cost, list):
        cost = cost[0] if cost else {}
    return {k: cost.get(k) for k in ("flops", "bytes accessed")
            if cost and k in cost}


def measure(fn, *args, iters: int = 5) -> dict:
    """Wall time + achieved FLOP/s for a jitted callable."""
    cost = estimate_cost(fn, *args)
    jfn = jax.jit(fn)
    force(jfn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        force(jfn(*args))
        times.append(time.perf_counter() - t0)
    sec = float(np.median(times))
    out = {"seconds": sec}
    if cost.get("flops"):
        out["gflops"] = cost["flops"] / 1e9
        out["gflops_per_sec"] = cost["flops"] / sec / 1e9
    return out
