"""Training-variant tests: vanilla / modified HiFi-GAN steps, the I_da
CodeGenerator GAN step (frozen pitch quantizer), and the f0-VQVAE step."""
import numpy as np

import jax
import jax.numpy as jnp

from speech_inpainting_tpu.models.codegen import (CodeGenerator,
                                                  CodeGeneratorConfig,
                                                  FoVQVAE, FoVQVAEConfig)
from speech_inpainting_tpu.models.hifigan import (Generator, HiFiGANConfig,
                                                  MultiPeriodDiscriminator,
                                                  MultiScaleDiscriminator)
from speech_inpainting_tpu.models.jukebox import ConvStackConfig
from speech_inpainting_tpu.ops.mel import MelConfig
from speech_inpainting_tpu.train.da import DATrainConfig, make_da_step
from speech_inpainting_tpu.train.f0vq import (F0VQConfig, create_f0vq_state,
                                              make_f0vq_eval, make_f0vq_step)
from speech_inpainting_tpu.train.gan import GANConfig, create_gan_state
from speech_inpainting_tpu.train.hifigan import (HiFiGANTrainConfig,
                                                 make_modified_step,
                                                 make_vanilla_step)

TINY_G = HiFiGANConfig(upsample_rates=(8, 2), upsample_kernel_sizes=(16, 4),
                       upsample_initial_channel=16,
                       resblock_kernel_sizes=(3,),
                       resblock_dilation_sizes=((1, 3),))
# hop must equal the generator total upsample (8*2 = 16)
MEL = MelConfig(n_fft=512, num_mels=80, hop_size=16, win_size=512)
MEL441 = MelConfig(n_fft=512, num_mels=80, hop_size=441, win_size=512)
MEL_FULL = MelConfig(n_fft=512, num_mels=80, hop_size=16, win_size=512,
                     fmax=None)


def init_discs(rng_key):
    mpd = MultiPeriodDiscriminator()
    msd = MultiScaleDiscriminator()
    x = jnp.zeros((1, 1, 2048))
    mp = mpd.init(jax.random.PRNGKey(1), x, x)["params"]
    mv = msd.init({"params": jax.random.PRNGKey(2)}, x, x, True)
    return mp, mv["params"], mv["spectral"]


def test_vanilla_and_modified_hifigan_steps(rng):
    seg = 2048
    cfg = HiFiGANTrainConfig(
        gan=GANConfig(steps_per_epoch=10),
        hifigan=TINY_G._replace() if hasattr(TINY_G, "_replace") else TINY_G,
        segment_size=seg, mask_len=2, mel_input=MEL, mel_441=MEL441,
        mel_loss=MEL_FULL)
    gen = Generator(cfg.hifigan)
    n_mel = MEL.num_frames(seg)
    gp = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, 80, n_mel)))["params"]
    mp, mv, spec = init_discs(0)
    audio = (rng.standard_normal((2, 1, seg)) * 0.2).astype(np.float32)

    state = create_gan_state(cfg.gan, gp, mp, mv, spec)
    step = jax.jit(make_vanilla_step(cfg))
    state, m = step(state, {"audio": jnp.asarray(audio)})
    assert np.isfinite(float(m["loss_gen_all"]))

    stepm = jax.jit(make_modified_step(cfg, rng.standard_normal(
        (10, 80)).astype(np.float32)))
    statem = create_gan_state(cfg.gan, gp, mp, mv, spec)
    statem, mm = stepm(statem, {
        "audio": jnp.asarray(audio),
        "mask_start": jnp.asarray([0, 1], jnp.int32)})
    assert np.isfinite(float(mm["loss_gen_all"]))
    # all-frames quantization variant (mask_len = -1)
    import dataclasses
    cfg_all = dataclasses.replace(cfg, mask_len=-1)
    stepa = jax.jit(make_modified_step(cfg_all, rng.standard_normal(
        (10, 80)).astype(np.float32)))
    statea = create_gan_state(cfg.gan, gp, mp, mv, spec)
    _, ma = stepa(statea, {"audio": jnp.asarray(audio),
                           "mask_start": jnp.asarray([0, 0], jnp.int32)})
    assert np.isfinite(float(ma["loss_gen_all"]))


STACK = ConvStackConfig(input_emb_width=1, output_emb_width=16, levels=1,
                        downs_t=(2,), strides_t=(2,), width=8, depth=2,
                        dilation_growth_rate=3)
F0CFG = FoVQVAEConfig(encoder=STACK, decoder=STACK, l_bins=6, emb_width=16)


def test_da_step_freezes_pitch_quantizer(rng):
    ccfg = CodeGeneratorConfig(
        hifigan=HiFiGANConfig(upsample_rates=(5, 4),
                              upsample_kernel_sizes=(11, 8),
                              upsample_initial_channel=16,
                              resblock_kernel_sizes=(3,),
                              resblock_dilation_sizes=((1, 3),),
                              in_dim=48, sampling_rate=16000),
        num_embeddings=10, embedding_dim=16,
        f0_quantizer=F0CFG)
    codegen = CodeGenerator(ccfg)
    B, F = 2, 16
    seg = F * 20  # upsample 5*4 = 20
    code = jnp.asarray(rng.integers(0, 10, (B, F)))
    f0 = jnp.asarray(rng.standard_normal((B, 1, F * 4)).astype(np.float32))
    emb = jnp.asarray(rng.standard_normal((B, 16)).astype(np.float32))
    variables = codegen.init({"params": jax.random.PRNGKey(0),
                              "vq": jax.random.PRNGKey(1)},
                             code, f0=f0, emb=emb)
    gp, vq_tree = variables["params"], variables["vq"]
    mp, mv, spec = init_discs(0)

    mel16 = MelConfig(n_fft=128, num_mels=20, hop_size=32, win_size=128,
                      sampling_rate=16000, fmax=None)
    cfg = DATrainConfig(codegen=ccfg,
                        gan=GANConfig(steps_per_epoch=10,
                                      frozen_g_paths=("fo_vqvae",)),
                        mel_loss=mel16)
    step = jax.jit(make_da_step(cfg, vq_tree))
    state = create_gan_state(cfg.gan, gp, mp, mv, spec)
    audio = (rng.standard_normal((B, 1, seg)) * 0.2).astype(np.float32)
    new_state, m = step(state, {"code": code, "f0": f0, "emb": emb,
                                "audio": jnp.asarray(audio)})
    assert np.isfinite(float(m["loss_gen_all"]))

    def maxdiff(a, b):
        return max(float(jnp.abs(x - y).max()) for x, y in zip(
            jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)))
    # frozen pitch quantizer untouched; the rest trained
    assert maxdiff(new_state.g_params["fo_vqvae"],
                   state.g_params["fo_vqvae"]) == 0.0
    assert maxdiff(new_state.g_params["generator"],
                   state.g_params["generator"]) > 0.0
    assert maxdiff(new_state.g_params["emb_c"], state.g_params["emb_c"]) > 0.0


def test_f0vq_step_learns(rng):
    cfg = F0VQConfig(model=F0CFG, steps_per_epoch=10)
    model = FoVQVAE(F0CFG)
    f0 = jnp.asarray(np.sin(np.linspace(0, 20, 2 * 64))
                     .reshape(2, 1, 64).astype(np.float32))
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "vq": jax.random.PRNGKey(1)}, f0, train=False)
    state = create_f0vq_state(cfg, variables["params"], variables["vq"])
    step = jax.jit(make_f0vq_step(cfg))
    _, m0 = step(state, {"f0": f0}, jax.random.PRNGKey(2))
    for i in range(30):
        state, m = step(state, {"f0": f0}, jax.random.PRNGKey(3 + i))
    assert float(m["recon"]) < float(m0["recon"])
    assert bool(state.vq["vq"]["level_0"]["initted"])
    ev = make_f0vq_eval(cfg)
    em = ev(state.params, state.vq, f0)
    assert np.isfinite(float(em["recon"]))
