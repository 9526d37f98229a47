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
