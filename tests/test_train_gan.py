"""GAN train-step tests: one-step loss parity with the reference torch loop
(same weights, same batch, same D-then-G schedule incl. AdamW updates), and
learning sanity over repeated steps."""
import itertools

import numpy as np
import torch

import jax
import jax.numpy as jnp

from speech_inpainting_tpu.models.hifigan import (Generator, HiFiGANConfig,
                                                  MultiPeriodDiscriminator,
                                                  MultiScaleDiscriminator)
from speech_inpainting_tpu.convert.hifigan_torch import (convert_generator,
                                                         convert_mpd,
                                                         convert_msd)
from speech_inpainting_tpu.ops.mel import MelConfig, mel_spectrogram
from speech_inpainting_tpu.train.gan import (GANConfig, create_gan_state,
                                             make_gan_step)

from reference_loader import AttrDict, ref_hifigan_models, seed_all

TINY = dict(resblock="1", upsample_rates=[8, 2], upsample_kernel_sizes=[16, 4],
            upsample_initial_channel=32, resblock_kernel_sizes=[3],
            resblock_dilation_sizes=[[1, 3, 5]])
SEG = 2048
MEL = MelConfig(n_fft=512, num_mels=16, hop_size=128, win_size=512, fmax=None)


def torch_mel(y):
    """Same GEMM-DFT mel as ours, in torch, for the reference loop."""
    got = mel_spectrogram(jnp.asarray(y.detach().numpy()), MEL)
    return torch.from_numpy(np.asarray(got))


def build_pair(rng):
    seed_all()
    ref = ref_hifigan_models()
    h = AttrDict(TINY)
    tg = ref.Generator(h)
    tmpd = ref.MultiPeriodDiscriminator()
    tmsd = ref.MultiScaleDiscriminator()
    cfg = HiFiGANConfig(
        resblock="1", upsample_rates=(8, 2), upsample_kernel_sizes=(16, 4),
        upsample_initial_channel=32, resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 3, 5),))
    g_params = convert_generator(tg.state_dict(), cfg)
    mpd_params = convert_mpd(tmpd.state_dict())
    msd_params, spectral = convert_msd(tmsd.state_dict())

    mel_in = rng.standard_normal((2, 80, SEG // 16)).astype(np.float32)
    y = (rng.standard_normal((2, 1, SEG)) * 0.2).astype(np.float32)
    return (tg, tmpd, tmsd, ref), (cfg, g_params, mpd_params, msd_params,
                                   spectral), (mel_in, y)


def run_torch_step(tg, tmpd, tmsd, ref, mel_in, y, lr=2e-4):
    """The reference loop body (train.py:148-186) for one step."""
    optim_g = torch.optim.AdamW(tg.parameters(), lr, betas=(0.8, 0.99))
    optim_d = torch.optim.AdamW(
        itertools.chain(tmsd.parameters(), tmpd.parameters()), lr,
        betas=(0.8, 0.99))
    x = torch.from_numpy(mel_in)
    y_t = torch.from_numpy(y)
    y_mel = torch_mel(y_t[:, 0])

    y_g_hat = tg(x)
    y_g_hat_mel = torch_mel(y_g_hat[:, 0])

    optim_d.zero_grad()
    y_df_hat_r, y_df_hat_g, _, _ = tmpd(y_t, y_g_hat.detach())
    loss_disc_f, _, _ = ref.discriminator_loss(y_df_hat_r, y_df_hat_g)
    y_ds_hat_r, y_ds_hat_g, _, _ = tmsd(y_t, y_g_hat.detach())
    loss_disc_s, _, _ = ref.discriminator_loss(y_ds_hat_r, y_ds_hat_g)
    (loss_disc_f + loss_disc_s).backward()
    optim_d.step()

    optim_g.zero_grad()
    loss_mel = torch.nn.functional.l1_loss(y_mel, y_g_hat_mel) * 45
    _, y_df_hat_g, fmap_f_r, fmap_f_g = tmpd(y_t, y_g_hat)
    _, y_ds_hat_g, fmap_s_r, fmap_s_g = tmsd(y_t, y_g_hat)
    loss_fm_f = ref.feature_loss(fmap_f_r, fmap_f_g)
    loss_fm_s = ref.feature_loss(fmap_s_r, fmap_s_g)
    loss_gen_f, _ = ref.generator_loss(y_df_hat_g)
    loss_gen_s, _ = ref.generator_loss(y_ds_hat_g)
    loss_gen_all = (loss_gen_s + loss_gen_f + loss_fm_s + loss_fm_f
                    + loss_mel)
    loss_gen_all.backward()
    optim_g.step()
    return dict(loss_disc=float(loss_disc_f + loss_disc_s),
                loss_gen_all=float(loss_gen_all),
                mel_error=float(loss_mel) / 45.0)


def test_gan_step_parity_with_reference(rng):
    (tg, tmpd, tmsd, ref), (cfg, gp, mpdp, msdp, spec), (mel_in, y) = \
        build_pair(rng)
    want = run_torch_step(tg, tmpd, tmsd, ref, mel_in, y)

    gan_cfg = GANConfig()
    gen = Generator(cfg)

    def gen_fwd(g_params, batch):
        return gen.apply({"params": g_params}, batch["mel"])

    step = jax.jit(make_gan_step(gen_fwd, lambda w: mel_spectrogram(w, MEL),
                                 gan_cfg))
    state = create_gan_state(gan_cfg, gp, mpdp, msdp, spec)
    batch = {"mel": jnp.asarray(mel_in), "audio": jnp.asarray(y),
             "mel_loss": mel_spectrogram(jnp.asarray(y[:, 0]), MEL)}
    new_state, m = step(state, batch)

    np.testing.assert_allclose(float(m["loss_disc"]), want["loss_disc"],
                               rtol=1e-3)
    np.testing.assert_allclose(float(m["mel_error"]), want["mel_error"],
                               rtol=1e-3)
    # G loss is evaluated against the post-update discriminators in both
    # frameworks — matching it validates the optimizer semantics too.
    np.testing.assert_allclose(float(m["loss_gen_all"]), want["loss_gen_all"],
                               rtol=5e-3)

    # our updated generator must match torch's post-step weights
    want_gp = convert_generator(tg.state_dict(), cfg)
    got_leaves = sorted(jax.tree_util.tree_leaves_with_path(
        new_state.g_params), key=lambda kv: str(kv[0]))
    want_leaves = sorted(jax.tree_util.tree_leaves_with_path(want_gp),
                         key=lambda kv: str(kv[0]))
    for (ka, a), (kb, b) in zip(got_leaves, want_leaves):
        assert str(ka) == str(kb)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4,
                                   err_msg=str(ka))


def test_gan_step_learns(rng):
    """Repeated steps on one batch: mel error must drop and stay finite."""
    _, (cfg, gp, mpdp, msdp, spec), (mel_in, y) = build_pair(rng)
    gan_cfg = GANConfig(steps_per_epoch=10)
    gen = Generator(cfg)

    def gen_fwd(g_params, batch):
        return gen.apply({"params": g_params}, batch["mel"])

    step = jax.jit(make_gan_step(gen_fwd, lambda w: mel_spectrogram(w, MEL),
                                 gan_cfg))
    state = create_gan_state(gan_cfg, gp, mpdp, msdp, spec)
    batch = {"mel": jnp.asarray(mel_in), "audio": jnp.asarray(y),
             "mel_loss": mel_spectrogram(jnp.asarray(y[:, 0]), MEL)}
    state, m0 = step(state, batch)
    for _ in range(15):
        state, m = step(state, batch)
    assert np.isfinite(float(m["loss_gen_all"]))
    assert float(m["mel_error"]) < float(m0["mel_error"])
    # spectral power-iteration state must have moved (some leaves, e.g. the
    # 1-dim conv_post u, are fixed points — check the max over all leaves)
    moved = max(float(jnp.abs(jnp.asarray(a) - jnp.asarray(b)).max())
                for a, b in zip(jax.tree_util.tree_leaves(spec),
                                jax.tree_util.tree_leaves(state.spectral)))
    assert moved > 0


def test_batched_disc_step_is_bit_identical(rng):
    """GANConfig(batched_disc=True) — the (real, fake)-as-one-2B-forward
    speed knob — must produce the SAME step as the two-call layout: losses
    and updated params bit-identical (weight-norm discs are per-sample; the
    spectral-norm scale keeps its sequential power-iteration path)."""
    _, (cfg, gp, mpdp, msdp, spec), (mel_in, y) = build_pair(rng)
    gen = Generator(cfg)

    def gen_fwd(g_params, batch):
        return gen.apply({"params": g_params}, batch["mel"])

    batch = {"mel": jnp.asarray(mel_in), "audio": jnp.asarray(y),
             "mel_loss": mel_spectrogram(jnp.asarray(y[:, 0]), MEL)}
    results = []
    for batched in (False, True):
        gan_cfg = GANConfig(batched_disc=batched)
        step = jax.jit(make_gan_step(
            gen_fwd, lambda w: mel_spectrogram(w, MEL), gan_cfg))
        state = create_gan_state(gan_cfg, gp, mpdp, msdp, spec)
        results.append(step(state, batch))
    (s0, m0), (s1, m1) = results
    for k in ("loss_disc", "loss_gen_all", "mel_error"):
        np.testing.assert_allclose(float(m1[k]), float(m0[k]), rtol=1e-6,
                                   err_msg=k)
    for (ka, a), (kb, b) in zip(
            jax.tree_util.tree_leaves_with_path(s1.g_params),
            jax.tree_util.tree_leaves_with_path(s0.g_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6,
                                   err_msg=str(ka))
    for (ka, a), (kb, b) in zip(
            jax.tree_util.tree_leaves_with_path(s1.d_params),
            jax.tree_util.tree_leaves_with_path(s0.d_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6,
                                   err_msg=str(ka))
    for a, b in zip(jax.tree_util.tree_leaves(s1.spectral),
                    jax.tree_util.tree_leaves(s0.spectral)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)


def test_folded_mpd_layout_equivalence(rng):
    """DiscriminatorP.fold_periods — the (B,C,p,T/p) TPU lane layout — must
    produce the same values as the torch layout: fmaps equal up to the
    axis swap, scores equal as sets, and every GAN loss identical."""
    from speech_inpainting_tpu import losses
    from speech_inpainting_tpu.models.hifigan import MultiPeriodDiscriminator

    y = jnp.asarray(rng.standard_normal((2, 1, 2048)) * 0.3, jnp.float32)
    y_hat = jnp.asarray(rng.standard_normal((2, 1, 2048)) * 0.3, jnp.float32)
    base = MultiPeriodDiscriminator()
    folded = MultiPeriodDiscriminator(fold_periods=True)
    params = base.init(jax.random.PRNGKey(0), y, y)["params"]

    r0, g0, fr0, fg0 = jax.jit(lambda p: base.apply({"params": p}, y, y_hat)
                               )(params)
    r1, g1, fr1, fg1 = jax.jit(
        lambda p: folded.apply({"params": p}, y, y_hat))(params)

    for a, b in zip(fr0 + fg0, fr1 + fg1):       # per-disc fmap lists
        for fa, fb in zip(a, b):
            np.testing.assert_allclose(np.asarray(fa),
                                       np.swapaxes(np.asarray(fb), 2, 3),
                                       atol=2e-5)
    # losses (means — axis-order invariant) must match to fp noise
    d0 = losses.discriminator_loss(r0, g0)[0]
    d1 = losses.discriminator_loss(r1, g1)[0]
    np.testing.assert_allclose(float(d1), float(d0), rtol=1e-6)
    np.testing.assert_allclose(
        float(losses.generator_loss(g1)[0]),
        float(losses.generator_loss(g0)[0]), rtol=1e-6)
    np.testing.assert_allclose(
        float(losses.feature_loss(fr1, fg1)),
        float(losses.feature_loss(fr0, fg0)), rtol=1e-5)


def test_disc_bf16_step_tracks_f32(rng):
    """GANConfig(disc_bf16=True) — bf16 discriminator compute (params f32,
    f32 loss reductions) — must track the f32 step: losses within bf16
    tolerance, updated generator params close, and the step still learns."""
    _, (cfg, gp, mpdp, msdp, spec), (mel_in, y) = build_pair(rng)
    gen = Generator(cfg)

    def gen_fwd(g_params, batch):
        return gen.apply({"params": g_params}, batch["mel"])

    batch = {"mel": jnp.asarray(mel_in), "audio": jnp.asarray(y),
             "mel_loss": mel_spectrogram(jnp.asarray(y[:, 0]), MEL)}
    results = []
    for bf16 in (False, True):
        gan_cfg = GANConfig(disc_bf16=bf16, steps_per_epoch=10)
        step = jax.jit(make_gan_step(
            gen_fwd, lambda w: mel_spectrogram(w, MEL), gan_cfg))
        state = create_gan_state(gan_cfg, gp, mpdp, msdp, spec)
        state, m = step(state, batch)
        results.append((step, state, m))
    (_, s0, m0), (stepb, s1, m1) = results
    # params stay f32 (mixed precision: bf16 compute only)
    assert all(a.dtype == jnp.float32
               for a in jax.tree_util.tree_leaves(s1.d_params))
    for k in ("loss_disc", "loss_gen_all", "mel_error"):
        np.testing.assert_allclose(float(m1[k]), float(m0[k]), rtol=2e-2,
                                   err_msg=k)
    for (ka, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(s1.g_params),
            jax.tree_util.tree_leaves_with_path(s0.g_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-3,
                                   err_msg=str(ka))
    # and it must still learn on repeated steps
    state, mfirst = s1, m1
    for _ in range(15):
        state, m = stepb(state, batch)
    assert np.isfinite(float(m["loss_gen_all"]))
    assert float(m["mel_error"]) < float(mfirst["mel_error"])


def test_gan_skip_nonfinite_optimizer_guard():
    """GANConfig.skip_nonfinite wraps both optimizers in the guard:
    nonfinite grads produce a zero update (inner moments frozen), finite
    grads apply normally — tested at the optimizer level so no GAN-step
    compile is paid."""
    import optax
    from speech_inpainting_tpu.train.gan import _make_g_opt, _make_opt

    cfg = GANConfig(skip_nonfinite=3, frozen_g_paths=("fo_vqvae",))
    params = {"fo_vqvae": jnp.ones((2,)), "conv": jnp.ones((3,))}
    for opt in (_make_opt(cfg), _make_g_opt(cfg)):
        state = opt.init(params)
        bad = {"fo_vqvae": jnp.zeros((2,)),
               "conv": jnp.array([1.0, jnp.nan, 0.5])}
        upd, state = opt.update(bad, state, params)
        assert all(float(jnp.abs(u).max()) == 0 for u in jax.tree.leaves(upd))
        assert int(state.notfinite_count) == 1
        good = jax.tree.map(jnp.ones_like, params)
        upd, state = opt.update(good, state, params)
        assert float(jnp.abs(upd["conv"]).max()) > 0
        assert int(state.notfinite_count) == 0     # reset on a finite step


def test_guard_never_accepts_nonfinite():
    """Unlike optax.apply_if_finite (which 'gives up and accepts' after N
    consecutive errors — applying the nan update), train/guard.py NEVER
    applies a nonfinite update, no matter how long the streak; the budget
    is enforced loop-side (RunConfig.abort_nonfinite)."""
    import optax
    from speech_inpainting_tpu.train.guard import (skip_if_nonfinite,
                                                   tree_if_finite)

    opt = skip_if_nonfinite(optax.sgd(0.1))
    params = {"w": jnp.ones((3,))}
    state = opt.init(params)
    bad = {"w": jnp.array([1.0, jnp.nan, 2.0])}
    for i in range(12):                     # far past any plausible budget
        upd, state = opt.update(bad, state, params)
        assert float(jnp.abs(upd["w"]).max()) == 0.0
        assert int(state.notfinite_count) == i + 1
    assert int(state.total_notfinite) == 12
    upd, state = opt.update({"w": jnp.ones((3,))}, state, params)
    assert float(jnp.abs(upd["w"]).max()) > 0
    assert int(state.notfinite_count) == 0
    assert int(state.total_notfinite) == 12

    # tree_if_finite gates in-forward state (EMA-VQ codebooks) the same way
    old = {"k": jnp.ones((2,)), "n": jnp.zeros(())}
    new_bad = {"k": jnp.array([1.0, jnp.inf]), "n": jnp.ones(())}
    kept = tree_if_finite(new_bad, old)
    np.testing.assert_array_equal(np.asarray(kept["k"]), [1.0, 1.0])
    assert float(kept["n"]) == 0.0          # whole tree rejected atomically
    new_ok = {"k": jnp.full((2,), 3.0), "n": jnp.ones(())}
    kept = tree_if_finite(new_ok, old)
    assert float(kept["n"]) == 1.0


def test_disc_overrides_reject_config_dtype_flags():
    """disc_bf16/folded_mpd cannot apply to pre-built mpd/msd overrides —
    silently ignoring them would fake a null ablation, so construction
    fails loudly."""
    import pytest
    from speech_inpainting_tpu.models.hifigan import MultiPeriodDiscriminator
    from speech_inpainting_tpu.train.gan import make_gan_step

    with pytest.raises(ValueError, match="overrides"):
        make_gan_step(lambda gp, b: None, lambda y: y,
                      GANConfig(disc_bf16=True),
                      mpd=MultiPeriodDiscriminator(periods=(2,)))
