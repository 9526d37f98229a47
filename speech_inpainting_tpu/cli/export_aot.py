"""Export an AOT serving artifact for the informed-inpainting graph.

Deployment subsystem the reference lacks (it re-imports model sources and
torch checkpoints in every serving process, I_ea/predict.py:117-149): this
writes a directory {graph.bin, params.pkl, meta.json} holding the WHOLE
fused serving program as serialized StableHLO plus its parameters. A serving
process reloads it with `infer.aot.load_serving_artifact(path).batch(...)` —
no flax modules, converters, or Python retrace; batch-polymorphic when the
graph allows (one artifact, any batch size). Mask position/length are traced
scalars, so one artifact also covers every mask.

Usage:
    sit-export --seconds 4 --hubert-checkpoint ... --hifigan-checkpoint ... \
        --kmeans ... --out artifacts/inpaint_4s
"""
from __future__ import annotations

import argparse


def main(argv=None):
    from .predict_ea import load_inpainter
    from ..infer.aot import save_serving_artifact

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--seconds", type=float, default=4.0,
                   help="utterance length the graph is exported for "
                        "(static shapes: one artifact per length)")
    p.add_argument("--batch", type=int, default=None,
                   help="pin a static batch size (default: polymorphic)")
    p.add_argument("--hubert-checkpoint", required=True)
    p.add_argument("--hubert-type", default="large",
                   choices=["base", "large"])
    p.add_argument("--hifigan-checkpoint", required=True)
    p.add_argument("--hifigan-config", default=None)
    p.add_argument("--kmeans", required=True)
    p.add_argument("--platforms", default=None,
                   help="comma-separated lowering targets (e.g. 'tpu' or "
                        "'tpu,cpu') for cross-platform artifacts; default: "
                        "the exporting backend")
    p.add_argument("--out", required=True, help="artifact directory")
    args = p.parse_args(argv)

    inp = load_inpainter(args)
    t22 = int(args.seconds * 22050)
    t16 = int(args.seconds * 16000)
    platforms = args.platforms.split(",") if args.platforms else None
    meta = save_serving_artifact(args.out, inp, t22, t16, batch=args.batch,
                                 platforms=platforms)
    kind = "batch-polymorphic" if meta["poly"] else f"batch={meta['batch']}"
    print(f"exported {kind} artifact for {args.seconds:g}s utterances "
          f"on platforms {meta['platforms']} -> {args.out}")


if __name__ == "__main__":
    main()
