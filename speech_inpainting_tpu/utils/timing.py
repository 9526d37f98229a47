"""Timing helpers that are honest on remote-execution backends.

`jax.block_until_ready` can return before the computation has actually
finished on tunneled/remote device backends (observed on this sandbox's
remote TPU: a 115 ms generator "completed" in 0.2 ms). The only reliable
completion barrier is a device→host read of output data, so `force` fetches
one element per leaf — negligible transfer, full synchronization.
"""
from __future__ import annotations

import time
from typing import Callable

import jax
import numpy as np


def force(tree):
    """Synchronize by reading one element of every array leaf."""
    for leaf in jax.tree_util.tree_leaves(tree):
        if hasattr(leaf, "ravel"):
            np.asarray(jax.device_get(leaf.ravel()[:1]))
    return tree


def timeit(fn: Callable, *args, iters: int = 5, warmup: int = 1, **kw):
    """Median wall seconds per call of fn(*args), with forced completion."""
    for _ in range(warmup):
        force(fn(*args, **kw))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        force(fn(*args, **kw))
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def differenced_time(run_window: Callable[[int], float], n1: int = 2,
                     n2: int = 12, reps: int = 2, attempts: int = 3):
    """Per-iteration seconds by loop-count differencing, or None.

    `run_window(n)` runs n back-to-back iterations (pipelined dispatch) and
    blocks once on the last output, returning its wall seconds. The delta
    (T(n2) − T(n1)) / (n2 − n1) cancels the constant dispatch+readback cost
    the tunnel adds per window — observed anywhere from ~0.25 s to ~25 s
    under congestion — so the recorded number can't inherit a phantom
    regression from tunnel load.

    Congestion noise can also make the delta non-positive or larger than the
    short window's own per-iteration bound (impossible if the constant cost
    is nonnegative); such measurements are retried up to `attempts` times
    and None is returned if none is credible — callers must fall back to a
    synced measurement and say so, never divide by a clamped delta.
    """
    for _ in range(attempts):
        t1 = min(run_window(n1) for _ in range(reps))
        t2 = min(run_window(n2) for _ in range(reps))
        dt = (t2 - t1) / (n2 - n1)
        if 0.0 < dt <= t1 / n1:
            return dt
    return None


def differenced_or_fallback(run_window: Callable[[int], float],
                            fallback_s: float, **kw):
    """(per-iteration seconds, differenced?) — `differenced_time` with an
    explicit fallback instead of None. The single shared fallback policy
    for bench.py / bench_train.py: never divide a noise-clamped delta;
    report the fallback and mark it (differenced=False) so a congested
    round can't masquerade as a measured regression. The fallback itself
    must be a min-of-several synced samples, not a single one — congestion
    is exactly the condition that both triggers the fallback and inflates
    single samples."""
    dt = differenced_time(run_window, **kw)
    return (fallback_s, False) if dt is None else (dt, True)
