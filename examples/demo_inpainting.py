"""End-to-end demo (the speech_inpainting_demo.ipynb equivalent).

Runs the full informed-inpainting pipeline on one real utterance with
randomly-initialized models when no checkpoints are given (shapes, timings,
and artifact set are identical to the trained flow), or with converted
reference checkpoints when paths are provided. Writes the reference artifact
set and prints objective metrics + throughput.

  python examples/demo_inpainting.py [--wav W] [--out demo_out] \
      [--hubert-checkpoint ...] [--hifigan-checkpoint ...] [--kmeans ...]
"""
import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--wav",
                   default="/root/reference/I_ea/hifi_gan/test_files/"
                           "LJ001-0001_22k.wav")
    p.add_argument("--out", default="demo_out")
    p.add_argument("--start-sec", type=float, default=1.5)
    p.add_argument("--mask-ms", type=int, default=200)
    p.add_argument("--hubert-checkpoint", default=None)
    p.add_argument("--hifigan-checkpoint", default=None)
    p.add_argument("--kmeans", default=None)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from speech_inpainting_tpu.data.audio import load_wav, save_wav
    from speech_inpainting_tpu.infer.inpaint import (InformedInpainter,
                                                     InpainterConfig)
    from speech_inpainting_tpu.metrics.objective import si_sdr
    from speech_inpainting_tpu.metrics.stoi import stoi
    from speech_inpainting_tpu.models.hifigan import Generator, HiFiGANConfig
    from speech_inpainting_tpu.models.hubert import (EncoderWithHead,
                                                     HubertConfig)
    from speech_inpainting_tpu.quantize.kmeans import KMeans, fit_kmeans
    from speech_inpainting_tpu.ops.mel import (HUBERT_ALIGNED_MEL_22K,
                                               mel_spectrogram)

    print("devices:", jax.devices())
    wav22, _ = load_wav(args.wav, target_sr=22050)
    wav16, _ = load_wav(args.wav, target_sr=16000)
    seconds = min(len(wav22) / 22050, 6.0)
    wav22 = wav22[:int(22050 * seconds)]
    wav16 = wav16[:int(16000 * seconds)]

    hcfg = HubertConfig.base()
    gcfg = HiFiGANConfig()
    if args.hubert_checkpoint:
        import torch
        from speech_inpainting_tpu.convert.hubert_torch import \
            convert_custom_model
        sd = torch.load(args.hubert_checkpoint, map_location="cpu",
                        weights_only=True)
        hp = convert_custom_model(sd, hcfg)
    else:
        print("no --hubert-checkpoint: random-initialized encoder")
        hub = EncoderWithHead(hcfg, out_dim=80)
        hp = hub.init(jax.random.PRNGKey(0), jnp.zeros((1, 3200)))["params"]
    if args.hifigan_checkpoint:
        from speech_inpainting_tpu.convert.hifigan_torch import \
            load_generator_checkpoint
        gp = load_generator_checkpoint(args.hifigan_checkpoint, gcfg)
    else:
        print("no --hifigan-checkpoint: random-initialized vocoder")
        gen = Generator(gcfg)
        gp = gen.init(jax.random.PRNGKey(1), jnp.zeros((1, 80, 8)))["params"]
    if args.kmeans:
        km = KMeans.load_auto(args.kmeans)
        centroids = km.centroids
    else:
        print("no --kmeans: fitting a codebook on this utterance's mel")
        mel = np.asarray(mel_spectrogram(jnp.asarray(wav22),
                                         HUBERT_ALIGNED_MEL_22K)).T
        centroids, _ = fit_kmeans(mel, 100, iters=10, n_init=1)

    inp = InformedInpainter(InpainterConfig(hubert=hcfg, hifigan=gcfg),
                            hp, gp, centroids)
    mask_pos = int(args.start_sec * 16000) // 320
    mask_len = args.mask_ms // 20

    from speech_inpainting_tpu.utils.timing import force
    t0 = time.perf_counter()
    out = force(inp(wav22, wav16, mask_pos, mask_len))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = force(inp(wav22, wav16, mask_pos, mask_len))
    steady = time.perf_counter() - t0

    outdir = Path(args.out)
    outdir.mkdir(parents=True, exist_ok=True)
    inpainted = np.asarray(out["inpainted"])
    save_wav(outdir / "orig.wav", wav16, 16000)
    save_wav(outdir / "inpainted.wav", inpainted, 22050)
    save_wav(outdir / "hifi_masked.wav",
             np.asarray(inp.hifi_masked(wav22, mask_pos, mask_len)), 22050)

    ref = wav22[:len(inpainted)]
    metrics = {
        "estoi": stoi(ref, inpainted, 22050, extended=True),
        "si_sdr_db": si_sdr(inpainted, ref),
        "compile_s": round(compile_s, 2),
        "steady_state_s": round(steady, 4),
        "x_realtime": round(len(inpainted) / 22050 / steady, 1),
    }
    print(json.dumps(metrics, indent=2))
    print(f"artifacts -> {outdir}")


if __name__ == "__main__":
    main()
