"""I_ea encoder-adaptation training CLI.

Replaces I_ea/main.py: fine-tune the HuBERT encoder + head to predict
k-means mel codewords of masked regions. Config via YAML with the reference's
config.yaml schema subset.

  python -m speech_inpainting_tpu.cli.train_ea --wavs DIR --split F \
      --labels-dir DIR --kmeans model.npy --checkpoint-path ckpt/ \
      [--hubert-type base --pretrained facebook/hubert-base-ls960]
"""
from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

from ..data.ea_dataset import EADataset
from ..data.manifests import read_split_list
from ..models.hubert import EncoderWithHead, HubertConfig
from ..quantize.kmeans import KMeans
from ..train.ea import EAConfig, create_state, eval_step, make_train_step
from ..train.run import RunConfig, run_ea_training


def build_dataset(wavs, split, labels_dir, max_length, mask_length,
                  cache_dir):
    names = [l.split("|")[0] for l in read_split_list(split)]
    paths = [Path(wavs) / f"{n}.wav" for n in names]
    labels = [np.load(Path(labels_dir) / f"{n}_labels.npy") for n in names]
    return EADataset(paths, labels, max_length=max_length,
                     mask_length=mask_length, cache_dir=cache_dir)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--wavs", required=True)
    p.add_argument("--split", required=True)
    p.add_argument("--valid-split", default=None)
    p.add_argument("--labels-dir", required=True)
    p.add_argument("--kmeans", required=True)
    p.add_argument("--checkpoint-path", required=True)
    p.add_argument("--log-dir", default=None)
    p.add_argument("--hubert-type", default="large",
                   choices=["base", "large"])
    p.add_argument("--pretrained", default=None,
                   help="HF checkpoint name/path to initialize from")
    p.add_argument("--prenet-only", action="store_true",
                   help="load only the conv prenet from --pretrained "
                        "(random transformer; reference load_pretrained="
                        "false)")
    p.add_argument("--loss", default="cos_sim",
                   choices=["cos_sim", "mse", "softmax"])
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--mask-length", type=int, default=20)
    p.add_argument("--max-wav-seconds", type=float, default=5.0)
    p.add_argument("--base-lr", type=float, default=1e-4)
    p.add_argument("--fc-lr", type=float, default=1e-4)
    p.add_argument("--freeze-encoder", action="store_true")
    p.add_argument("--cache-dir", default=None)
    p.add_argument("--mesh", action="store_true")
    p.add_argument("--buckets", type=int, default=0, metavar="K",
                   help="length-bucketed batching: pad each utterance to "
                        "the smallest of K quantile length buckets instead "
                        "of max length (K jit specializations, near-tight "
                        "padding; weakly pad-length-dependent like torch "
                        "dynamic padding — see data/ea_dataset)")
    p.add_argument("--grad-accum", type=int, default=1, metavar="K",
                   help="split each batch into K sequential microbatches "
                        "and sum their grads before the optimizer update — "
                        "identical semantics (sum-reduced losses), ~K x "
                        "lower peak activation memory; batch size must "
                        "divide by K")
    p.add_argument("--skip-nonfinite", type=int, default=0, metavar="N",
                   help="never apply nan/inf-grad updates; abort (after "
                        "checkpointing) past N consecutive skips")
    p.add_argument("--bf16", dest="bf16", action="store_true", default=True,
                   help="bf16 matmul/conv compute, f32 params/reductions "
                        "(the default: +7%% steps/s on a compute-bound step, "
                        "BENCH_TRAIN_r03.json; convergence pinned by "
                        "test_ea_bf16_step_tracks_f32)")
    p.add_argument("--f32", dest="bf16", action="store_false",
                   help="full-f32 compute (the reference's precision, "
                        "I_ea/main.py:144-266)")
    p.add_argument("--seed", type=int, default=1234)
    from ..parallel.distributed import add_cli_args, initialize_from_args
    add_cli_args(p)
    args = p.parse_args(argv)
    # multi-host: join the process group BEFORE any jax dispatch
    if initialize_from_args(args):
        args.mesh = True

    km = KMeans.load_auto(args.kmeans)
    centroids = np.asarray(km.centroids)
    out_dim = 100 if args.loss == "softmax" else centroids.shape[-1]

    if args.batch_size % args.grad_accum:
        raise SystemExit("--batch-size must be divisible by --grad-accum")
    cfg = EAConfig(base_lr=args.base_lr, fc_lr=args.fc_lr, loss=args.loss,
                   train_encoder=not args.freeze_encoder,
                   mask_length=args.mask_length,
                   grad_accum=args.grad_accum,
                   skip_nonfinite=args.skip_nonfinite)
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    hcfg = (HubertConfig.large(dtype=dtype) if args.hubert_type == "large"
            else HubertConfig.base(dtype=dtype))
    model = EncoderWithHead(hcfg, out_dim=out_dim)
    max_length = int(args.max_wav_seconds * 16000) + 3   # ref 161539 ≈ 5 s

    params = model.init(jax.random.PRNGKey(args.seed),
                        jnp.zeros((1, 3200)))["params"]
    if args.pretrained:
        from ..convert.hubert_torch import load_hf_pretrained
        _, hub_params = load_hf_pretrained(args.pretrained)
        if args.prenet_only:
            # reference load_pretrained=False: copy everything except the
            # transformer encoder (I_ea/model.py:36-47)
            keep = {k: v for k, v in hub_params.items()
                    if not (k.startswith("layers_") or
                            k in ("pos_conv_embed", "encoder_layer_norm"))}
            hub_params = {**params["hubert"], **keep}
        params = {**params, "hubert": hub_params}

    state = create_state(cfg, params)
    step = make_train_step(model, cfg, centroids)
    ev = eval_step(model, cfg, centroids)

    train_ds = build_dataset(args.wavs, args.split, args.labels_dir,
                             max_length, args.mask_length, args.cache_dir)
    valid_ds = (build_dataset(args.wavs, args.valid_split, args.labels_dir,
                              max_length, args.mask_length, args.cache_dir)
                if args.valid_split else None)

    mesh = None
    if args.mesh:
        from ..parallel.mesh import make_mesh
        mesh = make_mesh()
    run = RunConfig(epochs=args.epochs, checkpoint_dir=args.checkpoint_path,
                    log_dir=args.log_dir, mesh=mesh,
                    abort_nonfinite=args.skip_nonfinite)
    buckets = None
    if args.buckets:
        from ..data.ea_dataset import plan_buckets
        buckets = plan_buckets(np.asarray(train_ds.lengths), args.buckets,
                               max_length=max_length)
    run_ea_training(
        step, ev, state,
        lambda epoch: train_ds.batches(args.batch_size, epoch=epoch,
                                       seed=args.seed, buckets=buckets),
        (lambda epoch: valid_ds.batches(2, epoch=0, shuffle=False))
        if valid_ds else (lambda epoch: iter(())),
        run)


if __name__ == "__main__":
    main()
