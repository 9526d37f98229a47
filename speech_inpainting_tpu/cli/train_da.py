"""I_da decoder-adaptation training CLI (unit-HiFi-GAN).

Replaces I_da/scripts/train.py: train the CodeGenerator against frozen
HuBERT units from a JSON-lines manifest, with the frozen f0 quantizer.

  python -m speech_inpainting_tpu.cli.train_da --config hubert_lut.json \
      --train-manifest train.txt --valid-manifest val.txt \
      --f0-quantizer ckpt_f0vq/ --checkpoint-path ckpt/
"""
from __future__ import annotations

import argparse
import json
from pathlib import Path

import jax
import jax.numpy as jnp

from ..data.code_dataset import CodeDataset, CodeDatasetConfig
from ..data.manifests import parse_manifest
from ..models.codegen import CodeGenerator, CodeGeneratorConfig
from ..models.hifigan import MultiPeriodDiscriminator, MultiScaleDiscriminator
from ..ops.mel import MelConfig
from ..train.da import DATrainConfig, create_da_state, make_da_step
from ..train.gan import GANConfig, create_gan_state
from ..train.run import RunConfig, run_gan_training


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", required=True, help="reference-style json")
    p.add_argument("--train-manifest", required=True)
    p.add_argument("--valid-manifest", default=None,
                   help="held-out manifest for the periodic validation "
                        "mel-error sweep (scripts/train.py:362-385)")
    p.add_argument("--checkpoint-path", required=True)
    p.add_argument("--f0-quantizer", default=None,
                   help="our f0-VQVAE checkpoint dir OR torch g_* file")
    p.add_argument("--log-dir", default=None)
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--training-steps", type=int, default=None)
    p.add_argument("--cache-dir", default=None)
    p.add_argument("--skip-nonfinite", type=int, default=0,
                   metavar="N",
                   help="never apply nan/inf-grad updates; abort (after "
                        "checkpointing) past N consecutive skips")
    p.add_argument("--bf16-disc", action="store_true",
                   help="discriminators compute in bf16 (params/losses f32;"
                        " +20%% steps/s, BENCH_TRAIN_r03.json)")
    p.add_argument("--mesh", action="store_true")
    p.add_argument("--validation-interval", type=int, default=1000,
                   help="steps between validation sweeps "
                        "(train.py --validation_interval)")
    p.add_argument("--seed", type=int, default=1234)
    from ..parallel.distributed import add_cli_args, initialize_from_args
    add_cli_args(p)
    args = p.parse_args(argv)
    # multi-host: join the process group BEFORE any jax dispatch
    if initialize_from_args(args):
        args.mesh = True

    h = json.loads(Path(args.config).read_text())
    ccfg = CodeGeneratorConfig.from_dict(h)
    mel_loss = MelConfig(sampling_rate=h.get("sampling_rate", 16000),
                         n_fft=h.get("n_fft", 1024),
                         num_mels=h.get("num_mels", 80),
                         hop_size=h.get("hop_size", 256),
                         win_size=h.get("win_size", 1024),
                         fmin=h.get("fmin", 0),
                         fmax=h.get("fmax_for_loss"))
    cfg = DATrainConfig(
        codegen=ccfg,
        gan=GANConfig(learning_rate=h.get("learning_rate", 2e-4),
                      adam_b1=h.get("adam_b1", 0.8),
                      adam_b2=h.get("adam_b2", 0.99),
                      lr_decay=h.get("lr_decay", 0.999),
                      lambda_commit=h.get("lambda_commit_code", 0) or 0,
                      frozen_g_paths=("fo_vqvae",),
                      # bit-identical (BENCH_TRAIN_r03.json)
                      batched_disc=True, disc_bf16=args.bf16_disc,
                      skip_nonfinite=args.skip_nonfinite),
        mel_loss=mel_loss, segment_size=h.get("segment_size", 8960),
        code_hop_size=h.get("code_hop_size", 320))

    files, codes = parse_manifest(args.train_manifest)
    ds = CodeDataset(files, codes,
                     CodeDatasetConfig(segment_size=cfg.segment_size,
                                       code_hop_size=cfg.code_hop_size,
                                       mel=mel_loss,
                                       multispkr=h.get("multispkr", "_")),
                     cache_dir=args.cache_dir)

    # init params (shapes from one clipped batch)
    b0 = next(ds.batches(1, epoch=0))
    model = CodeGenerator(ccfg)
    variables = model.init(
        {"params": jax.random.PRNGKey(args.seed),
         "vq": jax.random.PRNGKey(args.seed + 1)},
        jnp.asarray(b0["code"]), f0=jnp.asarray(b0["f0"]),
        emb=jnp.asarray(b0["emb"]))
    gp, vq_tree = variables["params"], variables.get("vq", {})
    if args.f0_quantizer:
        if Path(args.f0_quantizer).is_file():
            from ..convert.ida_torch import load_fo_vqvae_checkpoint
            fo_params, fo_vq = load_fo_vqvae_checkpoint(
                args.f0_quantizer, ccfg.f0_quantizer)
        else:
            from ..utils.checkpoints import Checkpointer
            ck = Checkpointer(args.f0_quantizer)
            got = ck.restore("g_", {"params": gp["fo_vqvae"],
                                    "vq": vq_tree["fo_vqvae"]})
            fo_params, fo_vq = got["params"], got["vq"]
        gp = {**gp, "fo_vqvae": fo_params}
        vq_tree = {**vq_tree, "fo_vqvae": fo_vq}
        print(f"loaded frozen f0 quantizer from {args.f0_quantizer}")

    x = jnp.zeros((1, 1, cfg.segment_size))
    mpd = MultiPeriodDiscriminator().init(jax.random.PRNGKey(1), x, x)["params"]
    msdv = MultiScaleDiscriminator().init(
        {"params": jax.random.PRNGKey(2)}, x, x, True)
    if ccfg.code_encoder is not None:
        # joint enc-VQ-dec regime: the content codebook trains per step,
        # threaded through the state (scripts/train.py:99-112 regime)
        step = make_da_step(cfg)
        state = create_da_state(cfg, gp, mpd, msdv["params"],
                                msdv["spectral"], vq=vq_tree,
                                seed=args.seed)
    else:
        step = make_da_step(cfg, vq_tree)
        state = create_gan_state(cfg.gan, gp, mpd, msdv["params"],
                                 msdv["spectral"])

    mesh = None
    if args.mesh:
        from ..parallel.mesh import make_mesh
        mesh = make_mesh()
    run = RunConfig(epochs=args.epochs, checkpoint_dir=args.checkpoint_path,
                    log_dir=args.log_dir, training_steps=args.training_steps,
                    mesh=mesh, abort_nonfinite=args.skip_nonfinite,
                    validation_interval=args.validation_interval)
    batch_size = h.get("batch_size", 16)
    valid_fn = None
    if args.valid_manifest:
        from ..train.da import da_gen_fwd, make_da_eval
        from ..train.run import gan_valid_fn
        vfiles, vcodes = parse_manifest(args.valid_manifest)
        vds = CodeDataset(vfiles, vcodes,
                          CodeDatasetConfig(segment_size=cfg.segment_size,
                                            code_hop_size=cfg.code_hop_size,
                                            mel=mel_loss,
                                            multispkr=h.get("multispkr", "_")),
                          cache_dir=args.cache_dir)
        # deterministic sweep: fixed epoch/seed → the same clips every visit
        val_batches = list(vds.batches(min(batch_size, len(vfiles)),
                                       epoch=0, seed=args.seed + 1))
        # eval needs the vq leg: train-state codebooks in the joint regime,
        # the frozen pitch tree otherwise (it is not in the GAN state)
        params_fn = ((lambda s: (s.g_params, s.vq))
                     if ccfg.code_encoder is not None
                     else (lambda s: (s.g_params, vq_tree)))
        valid_fn = gan_valid_fn(make_da_eval(cfg), val_batches, mesh,
                                params_fn=params_fn,
                                media_fwd=da_gen_fwd(cfg),
                                media_mel=cfg.mel_loss,
                                sample_rate=mel_loss.sampling_rate)
    run_gan_training(step, state,
                     lambda epoch: ds.batches(batch_size, epoch=epoch,
                                              seed=args.seed),
                     run, valid_fn=valid_fn)


if __name__ == "__main__":
    main()
