"""Informed inpainting on one utterance (the I_ea predict path).

Replaces I_ea/predict.py:58-207: loads the wav at 22.05 k & 16 k, runs the
fused inpainting graph, and writes the reference's artifact set —
orig/masked/hifi_masked/inpainted/expected_inpaint wavs (+ mel pngs).

  python -m speech_inpainting_tpu.cli.predict_ea \
      --wav x.wav --start-sec 1.0 --end-sec 1.2 \
      --hubert-checkpoint best_00000000 --hifigan-checkpoint g_02500000 \
      --kmeans model.npy --out prediction/

Long-form mode (beyond the reference, whose predictor is capped at one short
utterance — I_ea/config.yaml:11 max_wav_length 5 s): `--long-form` streams
windows of the recording through the same graph (`infer/longform.py`), so any
number of masks in an arbitrarily long file are inpainted with ONE compile:

  python -m speech_inpainting_tpu.cli.predict_ea \
      --wav hour_long.wav --long-form --mask 61.2-61.4 --mask 1803.0-1803.3 \
      --hubert-checkpoint ... --hifigan-checkpoint ... --kmeans model.npy
"""
from __future__ import annotations

import argparse
import json
import os
from pathlib import Path

import numpy as np

from ..data.audio import load_wav, save_wav
from ..infer.inpaint import InformedInpainter, InpainterConfig
from ..models.hifigan import HiFiGANConfig
from ..models.hubert import HubertConfig
from ..quantize.kmeans import KMeans


def save_fig(mel, out_dir, name):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    fig, ax = plt.subplots(figsize=(10, 4))
    im = ax.imshow(np.asarray(mel), aspect="auto", origin="lower",
                   interpolation="none")
    fig.colorbar(im, ax=ax)
    fig.savefig(Path(out_dir) / f"{name}.png", bbox_inches="tight")
    plt.close(fig)


def load_inpainter(args) -> InformedInpainter:
    km = KMeans.load_auto(args.kmeans)
    hcfg = (HubertConfig.large() if args.hubert_type == "large"
            else HubertConfig.base())

    if args.hubert_checkpoint.endswith((".pt", ".pth", ".bin")):
        import torch
        from ..convert.hubert_torch import convert_custom_model
        sd = torch.load(args.hubert_checkpoint, map_location="cpu",
                        weights_only=True)
        hp = convert_custom_model(sd, hcfg)
    else:
        from ..utils.checkpoints import Checkpointer
        ck = Checkpointer(Path(args.hubert_checkpoint).parent)
        from ..models.hubert import EncoderWithHead
        import jax, jax.numpy as jnp
        model = EncoderWithHead(hcfg, out_dim=km.centroids.shape[-1])
        template = model.init(jax.random.PRNGKey(0),
                              jnp.zeros((1, 3200)))["params"]
        hp = ck.restore(args.hubert_checkpoint, {"model": template})["model"]

    gcfg = HiFiGANConfig()
    if args.hifigan_config:
        gcfg = HiFiGANConfig.from_dict(
            json.loads(Path(args.hifigan_config).read_text()))
    if args.hifigan_checkpoint.startswith("g_") or \
            "/g_" in args.hifigan_checkpoint:
        try:
            from ..convert.hifigan_torch import load_generator_checkpoint
            gp = load_generator_checkpoint(args.hifigan_checkpoint, gcfg)
        except Exception:
            from ..utils.checkpoints import Checkpointer
            import jax, jax.numpy as jnp
            from ..models.hifigan import Generator
            gen = Generator(gcfg)
            template = gen.init(jax.random.PRNGKey(0),
                                jnp.zeros((1, gcfg.in_dim, 8)))["params"]
            ck = Checkpointer(Path(args.hifigan_checkpoint).parent)
            gp = ck.restore(args.hifigan_checkpoint,
                            {"generator": template})["generator"]
    else:
        raise ValueError("--hifigan-checkpoint must be a g_* file")
    return InformedInpainter(InpainterConfig(hubert=hcfg, hifigan=gcfg),
                             hp, gp, km.centroids)


def parse_mask_spans(start_sec, end_sec, masks):
    """Mask specs (seconds) -> (mask_pos, mask_len) on the global 20 ms frame
    grid (pos from the 16 k/320-hop convention, predict.py:85-90)."""
    spans = []
    for s in masks or []:
        a, _, b = s.partition("-")
        spans.append((float(a), float(b)))
    if (start_sec is None) != (end_sec is None):
        raise ValueError("--start-sec and --end-sec must be given together")
    if start_sec is not None:
        spans.append((start_sec, end_sec))
    if not spans:
        raise ValueError("give --start-sec/--end-sec or at least one --mask")
    if any(b <= a for a, b in spans):
        raise ValueError("mask end must be after its start")
    pos = np.array([int(a * 16000) // 320 for a, b in spans], np.int64)
    # round the ms count first: int() truncation turns (1.2-1.0)*1000 into
    # 199 ms -> 9 frames instead of the intended 10
    ln = np.array([max(round((b - a) * 1000) // 20, 1) for a, b in spans],
                  np.int64)
    return pos, ln


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--wav", required=True)
    p.add_argument("--start-sec", type=float, default=None)
    p.add_argument("--end-sec", type=float, default=None)
    p.add_argument("--mask", action="append", metavar="START-END",
                   help="mask span in seconds, repeatable "
                        "(e.g. --mask 1.0-1.2 --mask 5.3-5.5)")
    p.add_argument("--long-form", action="store_true",
                   help="windowed streaming over a recording of any length "
                        "(writes orig/masked/inpainted + spans.json)")
    p.add_argument("--window-sec", type=float, default=4.0,
                   help="long-form window length (one compile per value)")
    p.add_argument("--batch", type=int, default=8,
                   help="long-form windows per device dispatch")
    p.add_argument("--hubert-checkpoint", required=True)
    p.add_argument("--hubert-type", default="large",
                   choices=["base", "large"])
    p.add_argument("--hifigan-checkpoint", required=True)
    p.add_argument("--hifigan-config", default=None)
    p.add_argument("--kmeans", required=True)
    p.add_argument("--labels", default=None,
                   help="target frame labels (.npy) for expected_inpaint")
    p.add_argument("--out", default="prediction")
    args = p.parse_args(argv)

    wav22, _ = load_wav(args.wav, target_sr=22050)
    wav16, _ = load_wav(args.wav, target_sr=16000)
    try:
        pos_arr, len_arr = parse_mask_spans(args.start_sec, args.end_sec,
                                            args.mask)
    except ValueError as e:
        p.error(str(e))
    if len(pos_arr) > 1 and not args.long_form:
        p.error("multiple --mask spans require --long-form")

    inp = load_inpainter(args)
    out_dir = Path(args.out) / Path(args.wav).stem
    os.makedirs(out_dir, exist_ok=True)

    if args.long_form:
        from ..infer.longform import LongFormConfig, LongFormInpainter
        cfg = LongFormConfig(window_frames=max(int(args.window_sec * 50), 16),
                             batch=args.batch)
        try:
            out, spans = LongFormInpainter(inp, cfg)(wav22, wav16,
                                                     pos_arr, len_arr)
        except ValueError as e:
            # e.g. mask longer than the window capacity — surface as a CLI
            # error pointing at --window-sec, not a raw traceback
            p.error(f"{e} (try a larger --window-sec)")
        masked = wav22.copy()
        for q, n in zip(pos_arr, len_arr):
            masked[q * 441:(q + n) * 441] = 0.0
        save_wav(out_dir / "orig.wav", wav22, 22050)
        save_wav(out_dir / "masked.wav", masked, 22050)
        save_wav(out_dir / "inpainted.wav", out, 22050)
        (out_dir / "spans.json").write_text(json.dumps(
            {"pasted_sample_spans": [[int(a), int(b)] for a, b in spans],
             "sr": 22050}))
        print(f"{len(pos_arr)} mask(s) inpainted; artifacts -> {out_dir}")
        return

    mask_pos, mask_len = int(pos_arr[0]), int(len_arr[0])

    save_wav(out_dir / "orig.wav", wav16, 16000)
    out = inp(wav22, wav16, mask_pos, mask_len)
    save_wav(out_dir / "inpainted.wav", np.asarray(out["inpainted"]), 22050)
    save_wav(out_dir / "hifi_masked.wav",
             np.asarray(inp.hifi_masked(wav22, mask_pos, mask_len)), 22050)
    from ..ops.masking import mask_wave_frames
    import jax.numpy as jnp
    save_wav(out_dir / "masked.wav",
             np.asarray(mask_wave_frames(jnp.asarray(wav16), mask_pos,
                                         mask_len)), 16000)
    save_fig(out["mel_masked"], out_dir, "masked")
    save_fig(out["mel_inpainted"], out_dir, "inpainted")
    if args.labels:
        labels = np.load(args.labels)
        exp = inp.expected_inpaint(wav22, labels, mask_pos, mask_len)
        save_wav(out_dir / "expected_inpaint.wav",
                 np.asarray(exp["expected_inpaint"]), 22050)
        save_fig(exp["mel_expected"], out_dir, "expected")
    print("Predicted codewords:",
          np.asarray(out["pred_labels"])[mask_pos:mask_pos + mask_len])
    print(f"artifacts -> {out_dir}")


if __name__ == "__main__":
    main()
