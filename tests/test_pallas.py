"""Pallas fused-resblock kernel + FastGenerator engine tests (interpret mode
on CPU)."""
import numpy as np

import jax
import jax.numpy as jnp

from speech_inpainting_tpu.models.hifigan import Generator, HiFiGANConfig
from speech_inpainting_tpu.models.hifigan_fast import FastGenerator
from speech_inpainting_tpu.ops.conv import conv1d, get_padding
from speech_inpainting_tpu.ops.pallas_resblock import (fused_resblock1,
                                                       fused_resblock_step)


def _unfused_resblock1(x, w1, b1, w2, b2, dilations, K):
    for s, d in enumerate(dilations):
        h = jax.nn.leaky_relu(x, 0.1)
        h = conv1d(h, w1[s], b1[s], dilation=d, padding=get_padding(K, d))
        h = jax.nn.leaky_relu(h, 0.1)
        h = conv1d(h, w2[s], b2[s], dilation=1, padding=get_padding(K, 1))
        x = x + h
    return x


def test_fused_resblock1_full_block(rng):
    """The whole-block kernel (all 3 dilation steps fused) matches the
    chained unfused composition, including signal-edge zero padding."""
    for (B, C, T, K) in [(2, 32, 300, 3), (1, 16, 257, 11)]:
        dils = (1, 3, 5)
        S = len(dils)
        x = jnp.asarray(rng.standard_normal((B, C, T)).astype(np.float32))
        w1 = jnp.asarray(
            rng.standard_normal((S, C, C, K)).astype(np.float32) * 0.05)
        w2 = jnp.asarray(
            rng.standard_normal((S, C, C, K)).astype(np.float32) * 0.05)
        b1 = jnp.asarray(rng.standard_normal((S, C)).astype(np.float32) * 0.1)
        b2 = jnp.asarray(rng.standard_normal((S, C)).astype(np.float32) * 0.1)
        want = np.asarray(_unfused_resblock1(x, w1, b1, w2, b2, dils, K))
        got = np.asarray(fused_resblock1(x, w1, b1, w2, b2, dilations=dils,
                                         tile=128, interpret=True))
        np.testing.assert_allclose(got, want, atol=3e-5)


def test_fused_resblock_matches_unfused(rng):
    B, C, T, K, D = 2, 32, 300, 3, 5
    x = jnp.asarray(rng.standard_normal((B, C, T)).astype(np.float32))
    w1 = jnp.asarray(rng.standard_normal((C, C, K)).astype(np.float32) * 0.1)
    w2 = jnp.asarray(rng.standard_normal((C, C, K)).astype(np.float32) * 0.1)
    b1 = jnp.asarray(rng.standard_normal(C).astype(np.float32) * 0.1)
    b2 = jnp.asarray(rng.standard_normal(C).astype(np.float32) * 0.1)

    h = jax.nn.leaky_relu(x, 0.1)
    h = conv1d(h, w1, b1, dilation=D, padding=get_padding(K, D))
    h = jax.nn.leaky_relu(h, 0.1)
    h = conv1d(h, w2, b2, dilation=1, padding=get_padding(K, 1))
    want = np.asarray(x + h)

    got = np.asarray(fused_resblock_step(x, w1, b1, w2, b2, dilation=D,
                                         tile=128, interpret=True))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_fused_resblock_k11(rng):
    B, C, T, K, D = 1, 16, 257, 11, 3          # odd T exercises tail pad
    x = jnp.asarray(rng.standard_normal((B, C, T)).astype(np.float32))
    w1 = jnp.asarray(rng.standard_normal((C, C, K)).astype(np.float32) * 0.05)
    w2 = jnp.asarray(rng.standard_normal((C, C, K)).astype(np.float32) * 0.05)
    b1 = jnp.zeros(C)
    b2 = jnp.zeros(C)
    h = jax.nn.leaky_relu(x, 0.1)
    h = conv1d(h, w1, b1, dilation=D, padding=get_padding(K, D))
    h = jax.nn.leaky_relu(h, 0.1)
    h = conv1d(h, w2, b2, dilation=1, padding=get_padding(K, 1))
    want = np.asarray(x + h)
    got = np.asarray(fused_resblock_step(x, w1, b1, w2, b2, dilation=D,
                                         tile=128, interpret=True))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_fast_generator_matches_flax(rng):
    cfg = HiFiGANConfig(upsample_rates=(8, 2), upsample_kernel_sizes=(16, 4),
                        upsample_initial_channel=32,
                        resblock_kernel_sizes=(3, 7),
                        resblock_dilation_sizes=((1, 3, 5), (1, 3, 5)))
    gen = Generator(cfg)
    mel = jnp.asarray(rng.standard_normal((2, 80, 17)).astype(np.float32))
    params = gen.init(jax.random.PRNGKey(0), mel)["params"]
    want = np.asarray(gen.apply({"params": params}, mel))

    # XLA-only fast path (pallas gated off)
    fast = FastGenerator.from_params(cfg, params, pallas_max_channels=0)
    np.testing.assert_allclose(np.asarray(fast(mel)), want, atol=2e-5)

    # pallas path in interpret mode on the small-channel stage
    fast_p = FastGenerator.from_params(cfg, params, pallas_max_channels=16,
                                       interpret=True)
    np.testing.assert_allclose(np.asarray(fast_p(mel)), want, atol=2e-5)
