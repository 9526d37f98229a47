"""K-means tooling CLI: mel feature dump, codebook fit, label dump.

Replaces the reference's offline pipeline (I_ea/dataset/mel_dump.py,
kmeans_learn.py, km_label.py): dump per-utterance hop-441 mels + a flat
frame matrix, fit the codebook ON DEVICE, and write per-utterance frame
labels.

  python -m speech_inpainting_tpu.cli.kmeans_cli dump  --wavs DIR --split F --out DIR
  python -m speech_inpainting_tpu.cli.kmeans_cli fit   --features F.npy --k 100 --out model.npy
  python -m speech_inpainting_tpu.cli.kmeans_cli label --wavs DIR --split F --model M --out DIR
"""
from __future__ import annotations

import argparse
import os
from pathlib import Path

import numpy as np

import jax.numpy as jnp

from ..data.audio import load_wav
from ..data.manifests import read_split_list
from ..ops.mel import HUBERT_ALIGNED_MEL_22K, mel_spectrogram
from ..quantize.kmeans import KMeans, fit_kmeans


def _wav_names(args):
    if args.split:
        names = [l.split("|")[0] for l in read_split_list(args.split)]
    else:
        names = [p.stem for p in sorted(Path(args.wavs).glob("*.wav"))]
    return names


def cmd_dump(args):
    os.makedirs(args.out, exist_ok=True)
    frames = []
    for name in _wav_names(args):
        wav, _ = load_wav(Path(args.wavs) / f"{name}.wav", target_sr=22050)
        mel = np.asarray(mel_spectrogram(jnp.asarray(wav),
                                         HUBERT_ALIGNED_MEL_22K))
        np.save(Path(args.out) / f"{name}_mel.npy", mel)
        frames.append(mel.T)
    flat = np.concatenate(frames, axis=0)
    np.save(Path(args.out) / "train_valid.npy", flat)
    print(f"dumped {len(frames)} mels, {flat.shape[0]} frames "
          f"-> {args.out}/train_valid.npy")


def cmd_fit(args):
    feats = np.load(args.features, mmap_mode="r")
    C, inertia = fit_kmeans(np.asarray(feats), args.k, iters=args.iters,
                            seed=args.seed, n_init=args.n_init)
    KMeans(C).save(args.out)
    print(f"fitted k={args.k} on {feats.shape[0]} frames, "
          f"inertia {inertia:.5f} -> {args.out}")


def cmd_label(args):
    km = KMeans.load_auto(args.model)
    os.makedirs(args.out, exist_ok=True)
    for name in _wav_names(args):
        wav, _ = load_wav(Path(args.wavs) / f"{name}.wav", target_sr=22050)
        mel = mel_spectrogram(jnp.asarray(wav), HUBERT_ALIGNED_MEL_22K)
        labels = np.asarray(km(jnp.swapaxes(mel, 0, 1)))
        np.save(Path(args.out) / f"{name}_labels.npy", labels)
        np.save(Path(args.out) / f"{name}_mel_c.npy",
                np.asarray(km.centroids)[labels].T)
    print(f"labeled -> {args.out}")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)
    d = sub.add_parser("dump")
    d.add_argument("--wavs", required=True)
    d.add_argument("--split", default=None)
    d.add_argument("--out", required=True)
    f = sub.add_parser("fit")
    f.add_argument("--features", required=True)
    f.add_argument("--k", type=int, default=100)
    f.add_argument("--iters", type=int, default=50)
    f.add_argument("--n-init", type=int, default=3)
    f.add_argument("--seed", type=int, default=1234)
    f.add_argument("--out", required=True)
    l = sub.add_parser("label")
    l.add_argument("--wavs", required=True)
    l.add_argument("--split", default=None)
    l.add_argument("--model", required=True)
    l.add_argument("--out", required=True)
    args = p.parse_args(argv)
    {"dump": cmd_dump, "fit": cmd_fit, "label": cmd_label}[args.cmd](args)


if __name__ == "__main__":
    main()
