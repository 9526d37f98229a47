"""f0 VQ-VAE training CLI.

Replaces I_da/scripts/train_f0_vq.py: train the jukebox-VQ pitch quantizer
on f0 streams tracked on device.

  python -m speech_inpainting_tpu.cli.train_f0vq --config f0_vqvae.json \
      --train-manifest train.txt --checkpoint-path ckpt_f0vq/
"""
from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

from ..data.code_dataset import F0DatasetTPU
from ..data.manifests import parse_manifest
from ..data.pipeline import device_prefetch
from ..models.codegen import FoVQVAE, FoVQVAEConfig
from ..train.f0vq import (F0VQConfig, create_f0vq_state, make_f0vq_step)
from ..utils.checkpoints import Checkpointer
from ..utils.logging import TrainLogger


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", required=True)
    p.add_argument("--train-manifest", required=True)
    p.add_argument("--checkpoint-path", required=True)
    p.add_argument("--log-dir", default=None)
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--cache-dir", default=None)
    p.add_argument("--seed", type=int, default=1234)
    args = p.parse_args(argv)

    h = json.loads(Path(args.config).read_text())
    mcfg = FoVQVAEConfig.from_dict(h)
    cfg = F0VQConfig(model=mcfg,
                     learning_rate=h.get("learning_rate", 2e-4),
                     adam_b1=h.get("adam_b1", 0.8),
                     adam_b2=h.get("adam_b2", 0.99),
                     lr_decay=h.get("lr_decay", 0.999),
                     lambda_commit=h.get("lambda_commit", 0.02))

    files, _ = parse_manifest(args.train_manifest)
    ds = F0DatasetTPU(files, segment_size=h.get("segment_size", 16640),
                      cache_dir=args.cache_dir)

    model = FoVQVAE(mcfg)
    seg_frames = h.get("segment_size", 16640) // 80
    variables = model.init({"params": jax.random.PRNGKey(args.seed),
                            "vq": jax.random.PRNGKey(args.seed + 1)},
                           jnp.zeros((1, 1, seg_frames)), train=False)
    state = create_f0vq_state(cfg, variables["params"], variables["vq"])
    step = jax.jit(make_f0vq_step(cfg))

    ckpt = Checkpointer(args.checkpoint_path)
    restored = ckpt.restore("g_", {"params": state.params, "vq": state.vq,
                                   "opt": state.opt_state,
                                   "steps": np.asarray(0)})
    if restored is not None:
        state = state.replace(params=restored["params"], vq=restored["vq"],
                              opt_state=restored["opt"],
                              step=jnp.asarray(restored["steps"]))
        print(f"resumed from step {int(state.step)}")

    logger = TrainLogger(args.log_dir)
    steps = int(state.step)
    rng = jax.random.PRNGKey(args.seed + 2)
    batch_size = h.get("batch_size", 16)
    for epoch in range(args.epochs):
        for batch in device_prefetch(ds.batches(batch_size, epoch=epoch,
                                                seed=args.seed)):
            rng, sub = jax.random.split(rng)
            state, metrics = step(state, batch, sub)
            steps += 1
            logger.step(steps, metrics)
            if steps % 5000 == 0:
                ckpt.save("g_", steps, {"params": state.params,
                                        "vq": state.vq,
                                        "opt": state.opt_state,
                                        "steps": np.asarray(steps)})
    ckpt.save("g_", steps, {"params": state.params, "vq": state.vq,
                            "opt": state.opt_state,
                            "steps": np.asarray(steps)}, wait=True)
    logger.close()


if __name__ == "__main__":
    main()
