"""Test configuration: force CPU with 8 virtual devices BEFORE jax import.

Multi-device sharding tests run on a virtual CPU mesh (the JAX-native substitute
for multi-chip hardware, per SURVEY.md §4d).
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

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
