"""I_da blind/informed inpainting CLI.

Replaces I_da/scripts/inpainting.py: for each manifest wav × mask sizes
(default {100,200,300,400} ms at 1.5 s), write
{name}_gt / _masked_{ms} / _gen / _inpainted_{ms}.wav.

  python -m speech_inpainting_tpu.cli.inpaint_da --config hubert_lut.json \
      --manifest val.txt --codegen-checkpoint g_00400000 \
      --hubert facebook/hubert-base-ls960 --layer 6 --kmeans km.npy \
      --out outputs/
"""
from __future__ import annotations

import argparse
import json
import os
from pathlib import Path

import numpy as np

from ..data.audio import load_wav, save_wav
from ..data.code_dataset import mel_stats_embedder
from ..data.manifests import parse_manifest
from ..infer.ida_inpaint import IdaInpainter
from ..models.codegen import CodeGeneratorConfig
from ..quantize.kmeans import KMeans

DEFAULT_MASKS_MS = (100, 200, 300, 400)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", required=True)
    p.add_argument("--manifest", required=True)
    p.add_argument("--codegen-checkpoint", required=True,
                   help="torch g_* file (converted on load)")
    p.add_argument("--hubert", required=True,
                   help="HF checkpoint name/path for the frozen encoder")
    p.add_argument("--layer", type=int, default=6,
                   help="feature tap layer (fairseq output_layer)")
    p.add_argument("--kmeans", required=True)
    p.add_argument("--mask-ms", type=int, nargs="+",
                   default=list(DEFAULT_MASKS_MS))
    p.add_argument("--out", required=True)
    args = p.parse_args(argv)

    h = json.loads(Path(args.config).read_text())
    ccfg = CodeGeneratorConfig.from_dict(h)
    from ..convert.ida_torch import load_code_generator_checkpoint
    cg_params, vq_tree = load_code_generator_checkpoint(
        args.codegen_checkpoint, ccfg)
    from ..convert.hubert_torch import load_hf_pretrained
    hcfg, hp = load_hf_pretrained(args.hubert)
    km = KMeans.load_auto(args.kmeans)

    inp = IdaInpainter(ccfg, cg_params, vq_tree, hcfg, hp, km.centroids,
                       tap_layer=args.layer,
                       code_hop=h.get("code_hop_size", 320))
    embed = mel_stats_embedder(h.get("embedding_dim", 128))

    files, _ = parse_manifest(args.manifest)
    os.makedirs(args.out, exist_ok=True)
    sr = h.get("sampling_rate", 16000)
    rtfs = []
    for f in files:
        wav, _ = load_wav(f, target_sr=sr)
        name = Path(f).stem
        emb = embed(wav, sr)
        for ms in args.mask_ms:
            out = inp(wav, mask_size=ms * sr // 1000, emb=emb)
            if ms == args.mask_ms[0]:
                save_wav(Path(args.out) / f"{name}_gt.wav",
                         out["audio_gt"], sr)
                save_wav(Path(args.out) / f"{name}_gen.wav",
                         out["audio_gen"], sr)
            save_wav(Path(args.out) / f"{name}_masked_{ms}.wav",
                     out["audio_mask"], sr)
            save_wav(Path(args.out) / f"{name}_inpainted_{ms}.wav",
                     out["audio_inpainted"], sr)
            rtfs.append(out["rtf"])
    print(f"done: {len(files)} files x {len(args.mask_ms)} masks, "
          f"median RTF {np.median(rtfs):.4f} -> {args.out}")


if __name__ == "__main__":
    main()
