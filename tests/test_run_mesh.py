"""Runner-level SPMD integration: REAL GAN and EA steps driven through
run_gan_training / run_ea_training over the 8-device CPU mesh must equal the
single-device run (the DDP loop they replace, I_ea/hifi_gan/train.py:44-106).

Round-1 gap: the runners jitted step_fn with no shardings; only the step fns
were mesh-tested. These tests pin the runner path itself."""
import numpy as np

import jax
import jax.numpy as jnp

from speech_inpainting_tpu.models.hifigan import Generator, HiFiGANConfig, \
    MultiPeriodDiscriminator, MultiScaleDiscriminator
from speech_inpainting_tpu.models.hubert import EncoderWithHead, HubertConfig
from speech_inpainting_tpu.ops.mel import MelConfig, mel_spectrogram
from speech_inpainting_tpu.parallel.mesh import make_mesh
from speech_inpainting_tpu.train.ea import (EAConfig, create_state,
                                            make_train_step)
from speech_inpainting_tpu.train.gan import (GANConfig, create_gan_state,
                                             make_gan_step)
from speech_inpainting_tpu.train.run import (RunConfig, run_ea_training,
                                             run_gan_training)

MEL = MelConfig(n_fft=256, num_mels=8, hop_size=64, win_size=256, fmax=None)
SEG = 1024


def build_gan(rng):
    cfg = HiFiGANConfig(
        resblock="1", upsample_rates=(8, 2), upsample_kernel_sizes=(16, 4),
        upsample_initial_channel=16, resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 3),))
    gen = Generator(cfg)
    mel_in = rng.standard_normal((8, 80, SEG // 16)).astype(np.float32)
    y = (rng.standard_normal((8, 1, SEG)) * 0.2).astype(np.float32)
    gp = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, 80, 8)))["params"]
    # reduced discriminator stacks: the full MPD×5+MSD×3 mesh-jitted GAN
    # step takes tens of minutes to compile on the 8-device CPU backend;
    # the runner wiring under test is identical either way
    mpd = MultiPeriodDiscriminator(periods=(2, 3))
    msd = MultiScaleDiscriminator(scales=2)
    yz = jnp.zeros((1, 1, SEG))
    dp = mpd.init(jax.random.PRNGKey(1), yz, yz)["params"]
    sv = msd.init(jax.random.PRNGKey(2), yz, yz, True)
    gan_cfg = GANConfig(steps_per_epoch=10)

    def gen_fwd(g_params, batch):
        return gen.apply({"params": g_params}, batch["mel"])

    step = make_gan_step(gen_fwd, lambda w: mel_spectrogram(w, MEL), gan_cfg,
                         mpd=mpd, msd=msd)
    state = create_gan_state(gan_cfg, gp, dp, sv["params"], sv["spectral"])
    batch = {"mel": mel_in, "audio": y,
             "mel_loss": np.asarray(mel_spectrogram(jnp.asarray(y[:, 0]),
                                                    MEL))}
    return step, state, batch


def test_run_gan_training_mesh_equals_single(tmp_path, rng):
    step, state, batch = build_gan(rng)
    batches = lambda epoch: iter([batch, batch])  # noqa: E731

    run1 = RunConfig(epochs=1, checkpoint_dir=str(tmp_path / "one"),
                     checkpoint_interval=1000, validation_interval=1000,
                     stdout_interval=100)
    s1 = run_gan_training(step, state, batches, run1)

    mesh = make_mesh((("dp", -1),), devices=jax.devices()[:8])
    run8 = RunConfig(epochs=1, checkpoint_dir=str(tmp_path / "eight"),
                     checkpoint_interval=1000, validation_interval=1000,
                     stdout_interval=100, mesh=mesh)
    s8 = run_gan_training(step, state, batches, run8)
    assert int(s1.step) == int(s8.step) == 2

    # wiring check: the mesh-jitted step on identical params + the full
    # dp-sharded batch must reproduce the single-device losses exactly
    # (a batch-dropping / mis-sharding bug would shift them) ...
    from speech_inpainting_tpu.train.run import _mesh_jit
    j1, p1 = _mesh_jit(step, run1)
    j8, p8 = _mesh_jit(step, run8)
    from speech_inpainting_tpu.data.pipeline import device_prefetch
    b8 = next(device_prefetch(iter([batch]), mesh=mesh))
    _, m1 = j1(p1(state), jax.tree_util.tree_map(jnp.asarray, batch))
    _, m8 = j8(p8(state), b8)
    np.testing.assert_allclose(float(m8["loss_gen_all"]),
                               float(m1["loss_gen_all"]), rtol=1e-5)
    np.testing.assert_allclose(float(m8["loss_disc"]),
                               float(m1["loss_disc"]), rtol=1e-5)

    # ... while end-state params agree to the Adam reduction-order bound:
    # grads differ only by float association (~1e-7 rel), but Adam's first
    # steps are sign-like, so near-zero-grad elements can take up to the
    # full ±lr update either way — bound ≈ 2·lr·steps (measured 3.6e-4).
    tol = 2 * 2e-4 * 2
    for (ka, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(s1.g_params),
            jax.tree_util.tree_leaves_with_path(s8.g_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=tol,
                                   err_msg=str(ka))
    for (ka, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(s1.d_params),
            jax.tree_util.tree_leaves_with_path(s8.d_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=tol,
                                   err_msg=str(ka))


def test_run_ea_training_mesh_equals_single(tmp_path, rng):
    hcfg = HubertConfig(conv_dim=(16,) * 7, hidden_size=32,
                        num_hidden_layers=1, num_attention_heads=2,
                        intermediate_size=64, num_conv_pos_embeddings=15,
                        num_conv_pos_embedding_groups=1)
    model = EncoderWithHead(hcfg, out_dim=80)
    cfg = EAConfig(mask_length=2)
    B, T = 8, 3200
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, T)))["params"]
    centroids = rng.standard_normal((10, 80)).astype(np.float32)
    step = make_train_step(model, cfg, centroids)
    n_frames = int(hcfg.feature_lengths(np.array([T]))[0])
    batch = {
        "wav": rng.standard_normal((B, T)).astype(np.float32),
        "attn_mask": np.ones((B, T), np.int32),
        "mask_pos": rng.integers(0, n_frames - cfg.mask_length,
                                 B).astype(np.int32),
        "labels": rng.integers(0, 10, (B, cfg.mask_length)).astype(np.int32),
    }
    batches = lambda epoch: iter([batch, batch])  # noqa: E731
    ev = lambda params, vb: {"cos_sim_acc": 0.0}  # noqa: E731
    no_valid = lambda epoch: iter([])             # noqa: E731

    run1 = RunConfig(epochs=1, checkpoint_dir=str(tmp_path / "one"),
                     validation_interval=1000, stdout_interval=100)
    s1 = run_ea_training(step, ev, create_state(cfg, params), batches,
                         no_valid, run1)

    mesh = make_mesh((("dp", -1),), devices=jax.devices()[:8])
    run8 = RunConfig(epochs=1, checkpoint_dir=str(tmp_path / "eight"),
                     validation_interval=1000, stdout_interval=100, mesh=mesh)
    s8 = run_ea_training(step, ev, create_state(cfg, params), batches,
                         no_valid, run8)

    assert int(s1.step) == int(s8.step) == 2
    # Adam reduction-order bound (see the GAN test): ≈ 2·lr·steps
    tol = 2 * cfg.base_lr * 2
    for (ka, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(s1.params),
            jax.tree_util.tree_leaves_with_path(s8.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=tol,
                                   err_msg=str(ka))


def test_run_ea_training_hybrid_mesh_and_mesh_validation(tmp_path, rng):
    """(a) A ('dcn','ici') hybrid mesh with NO 'dp' axis is trainable by the
    runners (data_spec shards the batch dim over every axis) — previously
    _mesh_jit hardcoded P('dp') and the documented pod recipe was dead on
    arrival. (b) The validation sweep places its host batches on the SAME
    mesh as the global params (run.py vb_place) — an eval_fn jitted bare
    must still work mid-mesh-run."""
    hcfg = HubertConfig(conv_dim=(16,) * 7, hidden_size=32,
                        num_hidden_layers=1, num_attention_heads=2,
                        intermediate_size=64, num_conv_pos_embeddings=15,
                        num_conv_pos_embedding_groups=1)
    model = EncoderWithHead(hcfg, out_dim=80)
    cfg = EAConfig(mask_length=2)
    B, T = 8, 3200
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, T)))["params"]
    centroids = rng.standard_normal((10, 80)).astype(np.float32)
    step = make_train_step(model, cfg, centroids)
    from speech_inpainting_tpu.train.ea import eval_step
    ev = eval_step(model, cfg, centroids)
    n_frames = int(hcfg.feature_lengths(np.array([T]))[0])

    def mk(b):
        return {
            "wav": rng.standard_normal((b, T)).astype(np.float32),
            "attn_mask": np.ones((b, T), np.int32),
            "mask_pos": rng.integers(0, n_frames - cfg.mask_length,
                                     b).astype(np.int32),
            "labels": rng.integers(0, 10,
                                   (b, cfg.mask_length)).astype(np.int32),
        }

    batch = mk(B)
    mesh = make_mesh((("dcn", 2), ("ici", 4)), devices=jax.devices()[:8])
    assert "dp" not in mesh.axis_names
    run = RunConfig(epochs=1, checkpoint_dir=str(tmp_path),
                    validation_interval=2, stdout_interval=100, mesh=mesh)
    s = run_ea_training(step, ev, create_state(cfg, params),
                        lambda epoch: iter([batch, batch]),
                        lambda epoch: iter([mk(2)]), run)
    assert int(s.step) == 2
    assert all(np.isfinite(np.asarray(l)).all()
               for l in jax.tree_util.tree_leaves(s.params))
