"""Persistent XLA compilation cache.

The reference pays model build + cuDNN autotune on every process start; here
the equivalent cold-start cost is XLA compilation — the full HiFi-GAN V1 GAN
step takes minutes to compile (tunnel-dependent). Enabling jax's persistent
compilation cache makes that a once-per-machine cost: compiled executables
are serialized to disk keyed by HLO fingerprint and reloaded on later runs.

Call `enable_persistent_cache()` before the first jit dispatch (training CLIs
and benchmarks do). Harmless if the backend can't serialize executables —
jax falls back to compiling (errors are suppressed unless raised explicitly).
"""
from __future__ import annotations

import hashlib
import os

DEFAULT_DIR = os.path.expanduser("~/.cache/speech_inpainting_tpu/xla")


def machine_fingerprint() -> str:
    """Hash of this host's CPU feature flags (+ arch). XLA:CPU serializes
    AOT executables specialized to the COMPILING machine's features; loading
    them on a host without those features SIGILLs mid-run (observed: a
    cache carried across sandbox hosts crashed the test suite at the first
    big cached GAN executable, after cpu_aot_loader.cc warned about
    '+prefer-no-gather'). Keying the cache dir by fingerprint makes a host
    swap a cache MISS instead of a crash."""
    import platform
    feats = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    feats = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        pass
    key = f"{platform.machine()}|{feats}"
    return hashlib.sha256(key.encode()).hexdigest()[:16]


def enable_persistent_cache(path: str = DEFAULT_DIR,
                            min_compile_secs: float = 5.0) -> str:
    """Point jax's compilation cache at `path`/<machine-fingerprint>;
    entries are written for compiles slower than `min_compile_secs`.
    Returns the cache dir."""
    import jax

    path = os.path.join(path, machine_fingerprint())
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_enable_compilation_cache", True)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      min_compile_secs)
    # 0 = no size floor: every compile past the TIME threshold is cached
    # (the 5 s min_compile_time filter is what keeps small entries out)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return path
