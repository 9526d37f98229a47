"""Parity tests: flax HiFi-GAN vs the reference torch implementation.

Random-initialized reference torch models are converted through
`speech_inpainting_tpu.convert.hifigan_torch` and must produce matching
outputs — this validates architecture, padding, weight-norm semantics, and the
converter at once.
"""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from speech_inpainting_tpu.models.hifigan import (
    Generator, HiFiGANConfig, MultiPeriodDiscriminator,
    MultiScaleDiscriminator)
from speech_inpainting_tpu.convert.hifigan_torch import (
    convert_generator, convert_mpd, convert_msd)
from speech_inpainting_tpu import losses

from reference_loader import AttrDict, ref_hifigan_models, seed_all

TINY = dict(resblock="1", upsample_rates=[8, 2], upsample_kernel_sizes=[16, 4],
            upsample_initial_channel=32, resblock_kernel_sizes=[3, 7],
            resblock_dilation_sizes=[[1, 3, 5], [1, 3, 5]])


def tiny_cfg(**over):
    d = dict(TINY, **over)
    return HiFiGANConfig(
        resblock=d["resblock"],
        upsample_rates=tuple(d["upsample_rates"]),
        upsample_kernel_sizes=tuple(d["upsample_kernel_sizes"]),
        upsample_initial_channel=d["upsample_initial_channel"],
        resblock_kernel_sizes=tuple(d["resblock_kernel_sizes"]),
        resblock_dilation_sizes=tuple(tuple(x) for x in d["resblock_dilation_sizes"]),
        in_dim=d.get("in_dim", 80))


def test_generator_parity_with_reference(rng):
    seed_all()
    ref = ref_hifigan_models()
    h = AttrDict(TINY)
    tg = ref.Generator(h).eval()
    cfg = tiny_cfg()
    params = convert_generator(tg.state_dict(), cfg)

    mel = rng.standard_normal((2, 80, 23)).astype(np.float32)
    with torch.no_grad():
        want = tg(torch.from_numpy(mel)).numpy()
    got = np.asarray(Generator(cfg).apply({"params": params}, jnp.asarray(mel)))
    assert got.shape == want.shape == (2, 1, 23 * 16)
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_generator_parity_after_remove_weight_norm(rng):
    """Our weight-norm fold must equal torch's remove_weight_norm output."""
    seed_all()
    ref = ref_hifigan_models()
    h = AttrDict(TINY)
    tg = ref.Generator(h).eval()
    cfg = tiny_cfg()
    params = convert_generator(tg.state_dict(), cfg)
    tg.remove_weight_norm()
    mel = rng.standard_normal((1, 80, 17)).astype(np.float32)
    with torch.no_grad():
        want = tg(torch.from_numpy(mel)).numpy()
    got = np.asarray(Generator(cfg).apply({"params": params}, jnp.asarray(mel)))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_generator_ida_input_width(rng):
    """I_da CodeGenerator feeds 384-wide features (model_in_dim)."""
    cfg = tiny_cfg(in_dim=12)
    x = rng.standard_normal((1, 12, 10)).astype(np.float32)
    gen = Generator(cfg)
    variables = gen.init(jax.random.PRNGKey(0), jnp.asarray(x))
    y = gen.apply(variables, jnp.asarray(x))
    assert y.shape == (1, 1, 10 * 16)
    assert np.isfinite(np.asarray(y)).all()


def test_mpd_parity(rng):
    seed_all()
    ref = ref_hifigan_models()
    tm = ref.MultiPeriodDiscriminator().eval()
    params = convert_mpd(tm.state_dict())
    y = rng.standard_normal((1, 1, 4096)).astype(np.float32) * 0.2
    yh = rng.standard_normal((1, 1, 4096)).astype(np.float32) * 0.2
    with torch.no_grad():
        w_r, w_g, w_fr, w_fg = tm(torch.from_numpy(y), torch.from_numpy(yh))
    g_r, g_g, g_fr, g_fg = MultiPeriodDiscriminator().apply(
        {"params": params}, jnp.asarray(y), jnp.asarray(yh))
    for a, b in zip(g_r, w_r):
        np.testing.assert_allclose(np.asarray(a), b.numpy(), atol=1e-4, rtol=1e-3)
    # feature maps drive the FM loss — compare the last of each stack
    for a, b in zip(g_fg, w_fg):
        np.testing.assert_allclose(np.asarray(a[-1]), b[-1].numpy(),
                                   atol=1e-4, rtol=1e-3)


def test_msd_parity(rng):
    seed_all()
    ref = ref_hifigan_models()
    tm = ref.MultiScaleDiscriminator().eval()
    params, spectral = convert_msd(tm.state_dict())
    y = rng.standard_normal((1, 1, 4096)).astype(np.float32) * 0.2
    yh = rng.standard_normal((1, 1, 4096)).astype(np.float32) * 0.2
    with torch.no_grad():
        w_r, w_g, _, w_fg = tm(torch.from_numpy(y), torch.from_numpy(yh))
    # reference model is in eval(): stored (u, v) are used without iteration
    g_r, g_g, _, g_fg = MultiScaleDiscriminator().apply(
        {"params": params, "spectral": spectral},
        jnp.asarray(y), jnp.asarray(yh), False)
    for a, b in zip(g_r, w_r):
        np.testing.assert_allclose(np.asarray(a), b.numpy(), atol=1e-3, rtol=1e-2)
    for a, b in zip(g_fg, w_fg):
        np.testing.assert_allclose(np.asarray(a[-1]), b[-1].numpy(),
                                   atol=1e-3, rtol=1e-2)


def test_gan_losses_match_reference(rng):
    ref = ref_hifigan_models()
    outs_r = [rng.standard_normal((2, 7)).astype(np.float32) for _ in range(3)]
    outs_g = [rng.standard_normal((2, 7)).astype(np.float32) for _ in range(3)]
    fmaps_r = [[rng.standard_normal((2, 4, 5)).astype(np.float32)] for _ in range(3)]
    fmaps_g = [[rng.standard_normal((2, 4, 5)).astype(np.float32)] for _ in range(3)]

    t = lambda xs: [torch.from_numpy(x) for x in xs]
    want_d, _, _ = ref.discriminator_loss(t(outs_r), t(outs_g))
    got_d, _, _ = losses.discriminator_loss(outs_r, outs_g)
    np.testing.assert_allclose(float(got_d), want_d.item(), rtol=1e-5)

    want_g, _ = ref.generator_loss(t(outs_g))
    got_g, _ = losses.generator_loss(outs_g)
    np.testing.assert_allclose(float(got_g), want_g.item(), rtol=1e-5)

    want_f = ref.feature_loss([t(f) for f in fmaps_r], [t(f) for f in fmaps_g])
    got_f = losses.feature_loss(fmaps_r, fmaps_g)
    np.testing.assert_allclose(float(got_f), want_f.item(), rtol=1e-5)


def test_generator_grad_flow(rng):
    cfg = tiny_cfg()
    gen = Generator(cfg)
    mel = jnp.asarray(rng.standard_normal((1, 80, 9)).astype(np.float32))
    variables = gen.init(jax.random.PRNGKey(0), mel)

    def loss_fn(params):
        return jnp.mean(jnp.square(gen.apply({"params": params}, mel)))

    grads = jax.grad(loss_fn)(variables["params"])
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert any(float(jnp.abs(l).max()) > 0 for l in leaves)


def test_generator_v3_resblock2_parity(rng):
    """Config-V3 generators use ResBlock2 (2x lrelu->dilated conv)."""
    seed_all()
    ref = ref_hifigan_models()
    tiny3 = dict(resblock="2", upsample_rates=[8, 2],
                 upsample_kernel_sizes=[16, 4], upsample_initial_channel=32,
                 resblock_kernel_sizes=[3, 5],
                 resblock_dilation_sizes=[[1, 2], [2, 6]])
    tg = ref.Generator(AttrDict(tiny3)).eval()
    cfg = tiny_cfg(**tiny3)
    params = convert_generator(tg.state_dict(), cfg)
    mel = rng.standard_normal((2, 80, 11)).astype(np.float32)
    with torch.no_grad():
        want = tg(torch.from_numpy(mel)).numpy()
    got = np.asarray(Generator(cfg).apply({"params": params},
                                          jnp.asarray(mel)))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)
