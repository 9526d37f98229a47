"""Training smoke test on the real TPU: overfit a small HiFi-GAN on one real
utterance and verify the GAN losses move the generator toward the data
(mel error drops substantially), plus an I_ea encoder-adaptation smoke.

  python examples/train_smoke.py [--steps 200]
"""
import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=200)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from speech_inpainting_tpu.data.audio import load_wav, peak_normalize
    from speech_inpainting_tpu.models.hifigan import (
        Generator, HiFiGANConfig, MultiPeriodDiscriminator,
        MultiScaleDiscriminator)
    from speech_inpainting_tpu.ops.mel import MelConfig, mel_spectrogram
    from speech_inpainting_tpu.train.gan import GANConfig, create_gan_state
    from speech_inpainting_tpu.train.hifigan import (HiFiGANTrainConfig,
                                                     make_vanilla_step)
    from speech_inpainting_tpu.utils.timing import force

    print("devices:", jax.devices(), flush=True)
    wav, sr = load_wav(
        "/root/reference/I_ea/hifi_gan/test_files/LJ001-0001_22k.wav")
    wav = peak_normalize(wav, 0.95)

    gcfg = HiFiGANConfig(upsample_rates=(8, 8, 4), 
                         upsample_kernel_sizes=(16, 16, 8),
                         upsample_initial_channel=128,
                         resblock_kernel_sizes=(3, 7),
                         resblock_dilation_sizes=((1, 3, 5), (1, 3, 5)))
    seg = 8192
    mel_in = MelConfig()
    assert mel_in.hop_size == gcfg.total_upsample
    tcfg = HiFiGANTrainConfig(gan=GANConfig(steps_per_epoch=1000),
                              hifigan=gcfg, segment_size=seg)
    gen = Generator(gcfg)
    gp = gen.init(jax.random.PRNGKey(0),
                  jnp.zeros((1, 80, mel_in.num_frames(seg))))["params"]
    x = jnp.zeros((1, 1, seg))
    mpd = MultiPeriodDiscriminator().init(jax.random.PRNGKey(1), x, x)["params"]
    msdv = MultiScaleDiscriminator().init(
        {"params": jax.random.PRNGKey(2)}, x, x, True)
    state = create_gan_state(tcfg.gan, gp, mpd, msdv["params"],
                             msdv["spectral"])
    step = jax.jit(make_vanilla_step(tcfg))

    rng = np.random.default_rng(0)
    B = 8

    def batch():
        starts = rng.integers(0, len(wav) - seg, B)
        crops = np.stack([wav[s:s + seg] for s in starts])
        return {"audio": jnp.asarray(crops[:, None, :])}

    t0 = time.perf_counter()
    state, m0 = step(state, batch())
    force(m0["loss_gen_all"])
    compile_s = time.perf_counter() - t0
    first = float(m0["mel_error"])
    t0 = time.perf_counter()
    for i in range(args.steps):
        state, m = step(state, batch())
    force(m["loss_gen_all"])
    steps_per_sec = args.steps / (time.perf_counter() - t0)
    last = float(m["mel_error"])
    gan = {"compile_s": round(compile_s, 1),
           "steps_per_sec": round(steps_per_sec, 2),
           "mel_error_first": round(first, 3),
           "mel_error_last": round(last, 3)}
    print("hifigan-gan-smoke:", json.dumps(gan), flush=True)
    assert last < first * 0.7, "mel error did not drop"

    # ---- I_ea encoder smoke ------------------------------------------
    from speech_inpainting_tpu.models.hubert import (EncoderWithHead,
                                                     HubertConfig)
    from speech_inpainting_tpu.train.ea import (EAConfig, create_state,
                                                make_train_step)
    hcfg = HubertConfig(conv_dim=(64,) * 7, hidden_size=128,
                        num_hidden_layers=2, num_attention_heads=4,
                        intermediate_size=256, num_conv_pos_embeddings=15,
                        num_conv_pos_embedding_groups=1)
    cfg = EAConfig(mask_length=10, base_lr=1e-3, fc_lr=1e-3)
    model = EncoderWithHead(hcfg, out_dim=80)
    params = model.init(jax.random.PRNGKey(3), jnp.zeros((1, 3200)))["params"]
    ea_state = create_state(cfg, params)
    centroids = rng.standard_normal((100, 80)).astype(np.float32)
    ea_step = jax.jit(make_train_step(model, cfg, centroids))
    T = 48000
    wav16, _ = load_wav(
        "/root/reference/I_ea/hifi_gan/test_files/LJ001-0001_16k.wav")
    n_frames = int(hcfg.feature_lengths(np.array([T]))[0])
    eb = {
        "wav": jnp.asarray(np.tile(wav16[:T], (4, 1)).astype(np.float32)),
        "attn_mask": jnp.ones((4, T), jnp.int32),
        "mask_pos": jnp.asarray(rng.integers(0, n_frames - 10, 4), jnp.int32),
        "labels": jnp.asarray(rng.integers(0, 100, (4, 10)), jnp.int32),
    }
    ea_state, em0 = ea_step(ea_state, eb)
    force(em0["loss"])
    for _ in range(60):
        ea_state, em = ea_step(ea_state, eb)
    force(em["loss"])
    ea = {"loss_first": round(float(em0["loss"]), 2),
          "loss_last": round(float(em["loss"]), 2),
          "acc_last": round(float(em["acc"]), 3)}
    print("ea-smoke:", json.dumps(ea), flush=True)
    assert float(em["loss"]) < float(em0["loss"])
    print("TRAIN SMOKE OK")


if __name__ == "__main__":
    main()
