"""Joint enc-VQ-dec regime (I_da lambda_commit_code): per-step EMA content
codebook training threaded through the GAN step.

Parity: ONE joint step (generator fwd with EMA update_k, D step, G step with
λ·commit) vs the reference torch loop (scripts/train.py:243-297 +
src/modules/vq.py:57-90) — losses, post-step generator params AND the
post-step codebook (k / k_sum / k_elem) must match. Plus an
8-device==1-device SPMD check (GSPMD supplies the dist.all_reduce of the
one-hot segment sums, vq.py:69-71).
"""
import itertools

import numpy as np
import torch

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from speech_inpainting_tpu.convert.ida_torch import convert_code_generator
from speech_inpainting_tpu.models.codegen import (CodeGenerator,
                                                  CodeGeneratorConfig)
from speech_inpainting_tpu.models.hifigan import HiFiGANConfig
from speech_inpainting_tpu.models.jukebox import ConvStackConfig
from speech_inpainting_tpu.convert.hifigan_torch import (convert_mpd,
                                                         convert_msd)
from speech_inpainting_tpu.ops.mel import MelConfig, mel_spectrogram
from speech_inpainting_tpu.parallel.mesh import make_mesh
from speech_inpainting_tpu.train.da import (DATrainConfig, GANConfig,
                                            create_da_state, make_da_step)

from reference_loader import AttrDict, ref_hifigan_models, ref_ida_modules, \
    seed_all

STACK = dict(input_emb_width=1, output_emb_width=16, levels=1, downs_t=[2],
             strides_t=[2], width=8, depth=1, m_conv=1.0,
             dilation_growth_rate=3)
CODE_VQ = dict(l_bins=4, emb_width=16, mu=0.99, levels=1)
HIFI = dict(resblock="1", upsample_rates=[2, 2], upsample_kernel_sizes=[4, 4],
            upsample_initial_channel=16, resblock_kernel_sizes=[3],
            resblock_dilation_sizes=[[1, 3, 5]], model_in_dim=16,
            num_embeddings=10, embedding_dim=16, multispkr=None,
            f0_stats=None, f0_quantizer_path=None, lambda_commit_code=0.02,
            code_encoder_params=STACK, code_vq_params=CODE_VQ,
            spk_embeddings=4, sampling_rate=16000)
T_IN = 64          # code input samples -> 16 encoder frames -> 64 wav samples
MEL = MelConfig(n_fft=32, num_mels=8, hop_size=8, win_size=32, fmax=None)


def torch_mel(y):
    got = mel_spectrogram(jnp.asarray(y.detach().numpy()), MEL)
    return torch.from_numpy(np.asarray(got))


def our_cfg() -> CodeGeneratorConfig:
    return CodeGeneratorConfig(
        hifigan=HiFiGANConfig(
            resblock="1", upsample_rates=(2, 2), upsample_kernel_sizes=(4, 4),
            upsample_initial_channel=16, resblock_kernel_sizes=(3,),
            resblock_dilation_sizes=((1, 3, 5),), in_dim=16,
            sampling_rate=16000),
        multispkr=False, use_f0=False, f0_quantizer=None,
        code_encoder=ConvStackConfig.from_dict(STACK),
        code_vq_bins=4, code_vq_width=16)


def build_ref_joint(rng):
    """Torch CodeGenerator in the content-VQ regime, codebook initialized so
    every bin is alive (deterministic — no random dead-code restarts)."""
    seed_all()
    _, _, _, model = ref_ida_modules()
    ref = ref_hifigan_models()
    tm = model.CodeGenerator(AttrDict(HIFI)).train()
    tmpd = ref.MultiPeriodDiscriminator()
    tmsd = ref.MultiScaleDiscriminator()

    code = rng.standard_normal((2, 1, T_IN)).astype(np.float32)
    y = (rng.standard_normal((2, 1, T_IN)) * 0.2).astype(np.float32)

    blk = tm.code_vq.level_blocks[0]
    with torch.no_grad():
        flat = tm.code_encoder(torch.from_numpy(code))[0]
        flat = flat.permute(0, 2, 1).reshape(-1, 16)
        # codebook = 4 actual encoder-output rows: each is distance-0 to its
        # own bin, so every bin stays >= threshold after the EMA update and
        # the (random) restart branch is never taken
        blk.k = flat[[0, 9, 17, 25]].clone()
    blk.restore_k()          # init=True, k_sum=k, k_elem=ones (vq.py:45-55)
    return tm, tmpd, tmsd, ref, code, y


def run_torch_joint_step(tm, tmpd, tmsd, ref, code, y, lam=0.02, lr=2e-4):
    """Reference loop body with lambda_commit_code (train.py:243-297)."""
    optim_g = torch.optim.AdamW(tm.parameters(), lr, betas=(0.8, 0.99))
    optim_d = torch.optim.AdamW(
        itertools.chain(tmsd.parameters(), tmpd.parameters()), lr,
        betas=(0.8, 0.99))
    y_t = torch.from_numpy(y)
    y_mel = torch_mel(y_t[:, 0])

    y_g_hat, commit, _ = tm(code=torch.from_numpy(code))
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
    loss_gen_all = (ref.generator_loss(y_ds_hat_g)[0]
                    + ref.generator_loss(y_df_hat_g)[0]
                    + ref.feature_loss(fmap_s_r, fmap_s_g)
                    + ref.feature_loss(fmap_f_r, fmap_f_g)
                    + loss_mel + commit * lam)
    loss_gen_all.backward()
    optim_g.step()
    return dict(loss_disc=float(loss_disc_f + loss_disc_s),
                loss_gen_all=float(loss_gen_all),
                mel_error=float(loss_mel) / 45.0, commit=float(commit))


def make_our_step_and_state(tm, tmpd, tmsd):
    cg_cfg = our_cfg()
    da_cfg = DATrainConfig(codegen=cg_cfg,
                           gan=GANConfig(lambda_commit=0.02),
                           mel_loss=MEL)
    g_params, vq_tree = convert_code_generator(tm.state_dict(), cg_cfg)
    mpd_params = convert_mpd(tmpd.state_dict())
    msd_params, spectral = convert_msd(tmsd.state_dict())
    step = make_da_step(da_cfg)
    state = create_da_state(da_cfg, g_params, mpd_params, msd_params,
                            spectral, vq=vq_tree)
    return step, state


def test_joint_step_parity_with_reference(rng):
    tm, tmpd, tmsd, ref, code, y = build_ref_joint(rng)
    step, state = make_our_step_and_state(tm, tmpd, tmsd)
    want = run_torch_joint_step(tm, tmpd, tmsd, ref, code, y)

    batch = {"code": jnp.asarray(code), "audio": jnp.asarray(y),
             "mel_loss": mel_spectrogram(jnp.asarray(y[:, 0]), MEL)}
    new_state, m = jax.jit(step)(state, batch)

    np.testing.assert_allclose(float(m["loss_disc"]), want["loss_disc"],
                               rtol=1e-3)
    np.testing.assert_allclose(float(m["commit"]), want["commit"], rtol=1e-3)
    np.testing.assert_allclose(float(m["mel_error"]), want["mel_error"],
                               rtol=1e-3)
    np.testing.assert_allclose(float(m["loss_gen_all"]), want["loss_gen_all"],
                               rtol=5e-3)

    # post-step EMA codebook state must match torch's update_k exactly
    blk = tm.code_vq.level_blocks[0]
    got_vq = new_state.vq["code_vq"]["level_0"]
    np.testing.assert_allclose(np.asarray(got_vq["k"]), blk.k.numpy(),
                               atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got_vq["k_sum"]),
                               blk.k_sum.numpy(), atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got_vq["k_elem"]),
                               blk.k_elem.numpy(), atol=1e-6)
    # every bin stayed alive (the deterministic-parity precondition)
    assert (blk.k_elem.numpy() >= 1.0).all()

    # post-step generator params (incl. the content encoder) match torch
    want_gp, _ = convert_code_generator(tm.state_dict(), our_cfg())
    got_leaves = sorted(jax.tree_util.tree_leaves_with_path(
        new_state.g_params), key=lambda kv: str(kv[0]))
    want_leaves = sorted(jax.tree_util.tree_leaves_with_path(want_gp),
                         key=lambda kv: str(kv[0]))
    assert len(got_leaves) == len(want_leaves)
    for (ka, a), (kb, b) in zip(got_leaves, want_leaves):
        assert str(ka) == str(kb)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4,
                                   err_msg=str(ka))


def test_joint_step_8dev_equals_1dev(rng):
    """The same joint step over an 8-device dp mesh must produce the same
    params and codebook as single-device (the reference's dist.all_reduce
    semantics, recovered from GSPMD)."""
    tm, tmpd, tmsd, ref, _, _ = build_ref_joint(rng)
    step, state = make_our_step_and_state(tm, tmpd, tmsd)

    B = 8
    code = rng.standard_normal((B, 1, T_IN)).astype(np.float32)
    y = (rng.standard_normal((B, 1, T_IN)) * 0.2).astype(np.float32)
    batch = {"code": jnp.asarray(code), "audio": jnp.asarray(y),
             "mel_loss": mel_spectrogram(jnp.asarray(y[:, 0]), MEL)}

    s1, m1 = jax.jit(step)(state, batch)

    mesh = make_mesh((("dp", -1),), devices=jax.devices()[:8])
    repl, data = NamedSharding(mesh, P()), NamedSharding(mesh, P("dp"))
    state8 = jax.device_put(state, repl)
    batch8 = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, data), batch)
    s8, m8 = jax.jit(step, in_shardings=(repl, data),
                     out_shardings=(repl, repl))(state8, batch8)

    np.testing.assert_allclose(float(m8["loss_gen_all"]),
                               float(m1["loss_gen_all"]), rtol=1e-4)
    for key in ("k", "k_sum", "k_elem"):
        np.testing.assert_allclose(
            np.asarray(s8.vq["code_vq"]["level_0"][key]),
            np.asarray(s1.vq["code_vq"]["level_0"][key]),
            atol=1e-5, err_msg=key)
    for (ka, a), (kb, b) in zip(
            jax.tree_util.tree_leaves_with_path(s8.g_params),
            jax.tree_util.tree_leaves_with_path(s1.g_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4,
                                   err_msg=str(ka))


def test_joint_regime_codebook_moves(rng):
    """Repeated joint steps must actually train the codebook (round-1 gap:
    the content codebook was frozen during GAN training)."""
    tm, tmpd, tmsd, ref, code, y = build_ref_joint(rng)
    step, state = make_our_step_and_state(tm, tmpd, tmsd)
    batch = {"code": jnp.asarray(code), "audio": jnp.asarray(y),
             "mel_loss": mel_spectrogram(jnp.asarray(y[:, 0]), MEL)}
    k0 = np.asarray(state.vq["code_vq"]["level_0"]["k"])
    jstep = jax.jit(step)
    for _ in range(3):
        state, m = jstep(state, batch)
    assert np.isfinite(float(m["loss_gen_all"]))
    assert np.abs(np.asarray(state.vq["code_vq"]["level_0"]["k"]) - k0).max() \
        > 1e-6


def test_joint_step_skip_nonfinite_protects_vq(rng):
    """GANConfig.skip_nonfinite in the stateful-VQ regime: a nan batch must
    leave the EMA codebooks (which update in-forward, outside the
    optimizers' sight), generator params, AND discriminator params
    untouched; the next clean batch proceeds normally."""
    tm, tmpd, tmsd, ref, code, y = build_ref_joint(rng)
    cg_cfg = our_cfg()
    da_cfg = DATrainConfig(codegen=cg_cfg,
                           gan=GANConfig(lambda_commit=0.02,
                                         skip_nonfinite=3),
                           mel_loss=MEL)
    g_params, vq_tree = convert_code_generator(tm.state_dict(), cg_cfg)
    mpd_params = convert_mpd(tmpd.state_dict())
    msd_params, spectral = convert_msd(tmsd.state_dict())
    step = jax.jit(make_da_step(da_cfg))
    state = create_da_state(da_cfg, g_params, mpd_params, msd_params,
                            spectral, vq=vq_tree)

    bad_code = code.copy()
    bad_code[0, 0, 5] = np.nan
    bad = {"code": jnp.asarray(bad_code), "audio": jnp.asarray(y),
           "mel_loss": mel_spectrogram(jnp.asarray(y[:, 0]), MEL)}
    s_bad, m_bad = step(state, bad)
    assert int(m_bad["nonfinite_skips"]) == 1
    for name, new_t, old_t in (("vq", s_bad.vq, state.vq),
                               ("g", s_bad.g_params, state.g_params),
                               ("d", s_bad.d_params, state.d_params)):
        for a, b in zip(jax.tree_util.tree_leaves(new_t),
                        jax.tree_util.tree_leaves(old_t)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                          err_msg=name)

    good = {"code": jnp.asarray(code), "audio": jnp.asarray(y),
            "mel_loss": mel_spectrogram(jnp.asarray(y[:, 0]), MEL)}
    s_ok, m_ok = step(s_bad, good)
    assert int(m_ok["nonfinite_skips"]) == 0
    assert np.isfinite(float(m_ok["loss_gen_all"]))
    moved = any(not np.array_equal(np.asarray(a), np.asarray(b))
                for a, b in zip(jax.tree_util.tree_leaves(s_ok.vq),
                                jax.tree_util.tree_leaves(s_bad.vq)))
    assert moved
