"""Test configuration: force CPU with 8 virtual devices BEFORE jax import.

Multi-device sharding tests run on a virtual CPU mesh (the JAX-native substitute
for multi-chip hardware, per SURVEY.md §4d).
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_cpu_collective_call_terminate_timeout_seconds" not in flags:
    # XLA:CPU's collective rendezvous LOG(FATAL)s ("Exiting to ensure a
    # consistent program state") when the participating per-device threads
    # don't all arrive within its default 40 s. On this ONE-core host the
    # 8 virtual devices of a big mesh-jitted GAN step run serially, so
    # arrival skew routinely exceeds 40 s and the suite flakily aborts
    # mid-run (SIGABRT, no Python traceback). Raise the watchdogs far past
    # any real step time.
    flags += (" --xla_cpu_collective_call_warn_stuck_timeout_seconds=300"
              " --xla_cpu_collective_call_terminate_timeout_seconds=1200"
              " --xla_cpu_collective_timeout_seconds=1200")
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

# The sandbox pins JAX_PLATFORMS=axon via sitecustomize; the config update wins.
jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", jax.devices()

# Heavy graphs (mesh-jitted GAN steps) compile once per machine, not per run.
from speech_inpainting_tpu.utils.cache import enable_persistent_cache  # noqa: E402,E501

enable_persistent_cache()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
