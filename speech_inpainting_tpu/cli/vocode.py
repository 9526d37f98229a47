"""Vocoder inference CLI: wav→mel→wav, mel(.npy)→wav, and content-VQ code
extraction.

Replaces I_ea/hifi_gan/inference.py (wav→wav), inference_e2e.py (mel→wav),
inference_modified.py's replace_mel_cluster demo (--quantize-mel), and
I_da/scripts/infer_vqvae_codes.py (waveform → learned content units).

  python -m speech_inpainting_tpu.cli.vocode wav2wav --input-dir test_files \
      --checkpoint g_02500000 --out generated_files
  python -m speech_inpainting_tpu.cli.vocode mel2wav --input-dir mels \
      --checkpoint g_02500000 --out generated_files_from_mel
  python -m speech_inpainting_tpu.cli.vocode codes --config cfg.json \
      --checkpoint g_00100000 --manifest val.txt --out codes.txt
"""
from __future__ import annotations

import argparse
import json
import os
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

from ..data.audio import load_wav, peak_normalize, save_wav
from ..models.hifigan import Generator, HiFiGANConfig
from ..ops.mel import VOCODER_MEL_22K, mel_spectrogram


def _load_generator(checkpoint, config):
    gcfg = HiFiGANConfig.from_dict(
        json.loads(Path(config).read_text())) if config else HiFiGANConfig()
    from ..convert.hifigan_torch import load_generator_checkpoint
    gp = load_generator_checkpoint(checkpoint, gcfg)
    gen = Generator(gcfg)
    fwd = jax.jit(lambda mel: gen.apply({"params": gp}, mel)[:, 0])
    return fwd, gcfg


def replace_mel_span_with_centroids(mel, km, start: int, length: int):
    """The replace_mel_cluster listening demo (inference_modified.py:75-89):
    substitute `mel[..., start:start+length]` (mel (1, 80, T)) with each
    frame's nearest k-means centroid, to hear the quantization floor.
    The reference hardcodes frames [50, 250)."""
    m = np.array(mel)
    span = m[0, :, start:start + length]                 # (80, L)
    labels = np.asarray(km(span.T))
    m[0, :, start:start + length] = np.asarray(km.centroids)[labels].T
    return m


def cmd_wav2wav(args):
    fwd, gcfg = _load_generator(args.checkpoint, args.config)
    km = None
    if getattr(args, "quantize_mel", None):
        from ..quantize.kmeans import KMeans
        km = KMeans.load_auto(args.quantize_mel)
        q_start, q_len = (int(v) for v in args.quantize_span.split(":"))
    os.makedirs(args.out, exist_ok=True)
    for p in sorted(Path(args.input_dir).glob("*.wav")):
        wav, _ = load_wav(p, target_sr=gcfg.sampling_rate)
        wav = peak_normalize(wav, 0.95)
        mel = mel_spectrogram(jnp.asarray(wav)[None], VOCODER_MEL_22K)
        suffix = "_generated"
        if km is not None:
            mel = jnp.asarray(
                replace_mel_span_with_centroids(mel, km, q_start, q_len))
            suffix = "_generated_quantized"
        out = np.asarray(fwd(mel))[0]
        save_wav(Path(args.out) / f"{p.stem}{suffix}.wav", out,
                 gcfg.sampling_rate)
    print(f"-> {args.out}")


def cmd_mel2wav(args):
    fwd, gcfg = _load_generator(args.checkpoint, args.config)
    os.makedirs(args.out, exist_ok=True)
    for p in sorted(Path(args.input_dir).glob("*.npy")):
        mel = np.load(p)
        if mel.ndim == 2:
            mel = mel[None]
        out = np.asarray(fwd(jnp.asarray(mel, jnp.float32)))[0]
        save_wav(Path(args.out) / f"{p.stem}_generated_e2e.wav", out,
                 gcfg.sampling_rate)
    print(f"-> {args.out}")


def cmd_codes(args):
    from ..convert.ida_torch import load_code_generator_checkpoint
    from ..data.manifests import parse_manifest
    from ..models.codegen import CodeGenerator, CodeGeneratorConfig
    h = json.loads(Path(args.config).read_text())
    ccfg = CodeGeneratorConfig.from_dict(h)
    assert ccfg.code_encoder is not None, \
        "codes extraction needs a lambda_commit_code (content-VQ) config"
    params, vq = load_code_generator_checkpoint(args.checkpoint, ccfg)
    m = CodeGenerator(ccfg)
    enc = jax.jit(lambda x: m.apply({"params": params, "vq": vq}, x,
                                    method=CodeGenerator.encode_codes))
    files, _ = parse_manifest(args.manifest)
    with open(args.out, "w") as f:
        for p in files:
            wav, _ = load_wav(p, target_sr=h.get("sampling_rate", 16000))
            units = np.asarray(enc(jnp.asarray(wav)[None, None, :]))[0]
            f.write(Path(p).stem + "|" +
                    ",".join(str(int(u)) for u in units) + "\n")
    print(f"codes -> {args.out}")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)
    for name in ("wav2wav", "mel2wav"):
        s = sub.add_parser(name)
        s.add_argument("--input-dir", required=True)
        s.add_argument("--checkpoint", required=True)
        s.add_argument("--config", default=None)
        s.add_argument("--out", required=True)
        if name == "wav2wav":
            s.add_argument("--quantize-mel", default=None, metavar="KMEANS",
                           help="replace a mel span with nearest centroids "
                                "before vocoding (replace_mel_cluster demo)")
            s.add_argument("--quantize-span", default="50:200",
                           metavar="START:LEN",
                           help="frame span to quantize (reference default)")
    s = sub.add_parser("codes")
    s.add_argument("--config", required=True)
    s.add_argument("--checkpoint", required=True)
    s.add_argument("--manifest", required=True)
    s.add_argument("--out", required=True)
    args = p.parse_args(argv)
    {"wav2wav": cmd_wav2wav, "mel2wav": cmd_mel2wav,
     "codes": cmd_codes}[args.cmd](args)


if __name__ == "__main__":
    main()
