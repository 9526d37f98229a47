"""I_ea encoder-adaptation training: one pure jitted train step.

Re-designs the reference loop (I_ea/main.py:35-273) TPU-first:
  - waveform masking happens IN-GRAPH (vmapped frame masking) instead of in
    DataLoader workers; batches are fixed-shape (padded) so one compilation
    serves the whole run
  - masked-frame gathering is a vmapped dynamic_slice with a static
    mask_len (the reference batches share one mask length, main.py:172-176)
  - AdamW with the reference's two parameter groups (base_lr for the
    encoder, fc_lr for the head, betas (0.9,0.98), eps 1e-6, wd 1e-2) and
    global-norm clipping at 10 (main.py:113-120,187-190)
  - losses/metrics from losses.CentroidLosses (cos_sim / mse / softmax,
    accuracy, cos≥0.95 accuracy — main.py:178-200)

Data parallelism: jit the returned step with NamedSharding'd inputs over a
Mesh — gradient reduction is inserted by XLA (replacing DDP/NCCL).
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..losses import CentroidLosses
from ..models.hubert import EncoderWithHead
from ..ops.masking import mask_wave_frames


@dataclasses.dataclass(frozen=True)
class EAConfig:
    """Optimizer/loss hyperparameters (reference config.yaml `optimizer`)."""
    base_lr: float = 1e-4
    fc_lr: float = 1e-4
    betas: tuple = (0.9, 0.98)
    eps: float = 1e-6
    weight_decay: float = 1e-2
    clip_norm: float = 10.0
    loss: str = "cos_sim"            # cos_sim | mse | softmax
    train_encoder: bool = True       # reference train_encoder flag
    mask_length: int = 20            # frames (20 ms each)
    grad_accum: int = 1              # microbatches per optimizer update
    skip_nonfinite: int = 0          # >0: NEVER apply updates whose grads
                                     # contain nan/inf (params and optimizer
                                     # moments untouched — train/guard.py);
                                     # the loop aborts loudly, checkpointing
                                     # the still-finite state, once this many
                                     # CONSECUTIVE skips are seen at a
                                     # logging boundary (RunConfig.
                                     # abort_nonfinite). Changes the
                                     # opt_state pytree: flip only on fresh
                                     # runs, not mid-restore.


class EATrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any


def make_optimizer(cfg: EAConfig, params) -> optax.GradientTransformation:
    """clip(10) → {encoder: AdamW(base_lr), head: AdamW(fc_lr)}.

    With train_encoder=False only the head updates (reference freezes
    base_model params via requires_grad, I_ea/model.py:51-55)."""
    def adamw(lr):
        return optax.adamw(lr, b1=cfg.betas[0], b2=cfg.betas[1], eps=cfg.eps,
                           weight_decay=cfg.weight_decay)

    def label(path, _):
        top = path[0].key if hasattr(path[0], "key") else str(path[0])
        return "head" if top == "head" else "base"

    groups = {"head": adamw(cfg.fc_lr),
              "base": adamw(cfg.base_lr) if cfg.train_encoder
              else optax.set_to_zero()}
    opt = optax.chain(
        optax.clip_by_global_norm(cfg.clip_norm),
        optax.multi_transform(
            groups, lambda p: jax.tree_util.tree_map_with_path(label, p)))
    if cfg.skip_nonfinite:
        from .guard import skip_if_nonfinite
        opt = skip_if_nonfinite(opt)
    return opt


def create_state(cfg: EAConfig, params) -> EATrainState:
    opt = make_optimizer(cfg, params)
    return EATrainState(step=jnp.zeros((), jnp.int32), params=params,
                        opt_state=opt.init(params))


def make_train_step(model: EncoderWithHead, cfg: EAConfig,
                    centroids) -> Any:
    """Returns step(state, batch) -> (state, metrics). Batch fields:
      wav:        (B, T) float32 raw 16 kHz waveform (unmasked)
      attn_mask:  (B, T) int — 1 on real samples (HF processor convention)
      mask_pos:   (B,)  int32 — mask start frame per sample
      labels:     (B, mask_length) int32 — centroid ids of the masked frames
    """
    closses = CentroidLosses(centroids)
    opt = make_optimizer(cfg, None)
    L = cfg.mask_length

    def gather_masked(outputs, mask_pos):
        return jax.vmap(
            lambda o, p: jax.lax.dynamic_slice_in_dim(o, p, L, axis=0)
        )(outputs, mask_pos)

    def loss_fn(params, batch):
        wav = jax.vmap(mask_wave_frames, in_axes=(0, 0, None))(
            batch["wav"], batch["mask_pos"], L)
        outputs = model.apply({"params": params}, wav, batch["attn_mask"])
        values = gather_masked(outputs, batch["mask_pos"])
        labels = batch["labels"]
        if cfg.loss == "cos_sim":
            loss, pred = closses.cos_sim(values, labels)
        elif cfg.loss == "mse":
            loss, pred = closses.mse(values, labels)
        else:
            loss, pred = closses.soft_ce(values, labels)
        acc = jnp.mean((pred == labels).astype(jnp.float32))
        cs = closses.cos_sim_pred_target(pred, labels)
        cos_acc = jnp.mean((cs >= 0.95).astype(jnp.float32))
        return loss, dict(acc=acc, cos_sim_acc=cos_acc)

    def grads_and_metrics(params, batch):
        if cfg.grad_accum <= 1:
            (loss, metrics), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params, batch)
            return grads, dict(loss=loss, **metrics)
        # Gradient accumulation: scan K microbatches, SUM grads. Because the
        # reference losses reduce by SUM over the batch (loss_fn.py:6-101 —
        # kept in losses.py), summed microbatch grads equal the full-batch
        # gradient exactly (up to f32 reorder), so accumulation changes peak
        # activation memory (÷K), not training semantics; pinned by
        # tests/test_train_ea.py::test_grad_accum_matches_full_batch.
        A = cfg.grad_accum
        micro = jax.tree.map(
            lambda x: x.reshape((A, x.shape[0] // A) + x.shape[1:]), batch)

        def body(gsum, mb):
            (loss, metrics), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params, mb)
            return (jax.tree.map(jnp.add, gsum, grads),
                    dict(loss=loss, **metrics))

        zeros = jax.tree.map(jnp.zeros_like, params)
        grads, ms = jax.lax.scan(body, zeros, micro)
        # sum-reduced loss adds up; per-microbatch mean accuracies average
        # (equal microbatch sizes → mean of means == full-batch mean)
        metrics = {k: (v.sum() if k == "loss" else v.mean())
                   for k, v in ms.items()}
        return grads, metrics

    def step(state: EATrainState, batch):
        grads, metrics = grads_and_metrics(state.params, batch)
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        if cfg.skip_nonfinite:
            metrics["nonfinite_skips"] = opt_state.notfinite_count
        return EATrainState(step=state.step + 1, params=params,
                            opt_state=opt_state), metrics

    return step


def eval_step(model: EncoderWithHead, cfg: EAConfig, centroids):
    """Validation step: loss + accuracies, no update (main.py:209-258)."""
    closses = CentroidLosses(centroids)
    L = cfg.mask_length

    @jax.jit
    def step(params, batch):
        wav = jax.vmap(mask_wave_frames, in_axes=(0, 0, None))(
            batch["wav"], batch["mask_pos"], L)
        outputs = model.apply({"params": params}, wav, batch["attn_mask"])
        values = jax.vmap(
            lambda o, p: jax.lax.dynamic_slice_in_dim(o, p, L, axis=0)
        )(outputs, batch["mask_pos"])
        labels = batch["labels"]
        if cfg.loss == "cos_sim":
            loss, pred = closses.cos_sim(values, labels)
        elif cfg.loss == "mse":
            loss, pred = closses.mse(values, labels)
        else:
            loss, pred = closses.soft_ce(values, labels)
        cs = closses.cos_sim_pred_target(pred, labels)
        return dict(loss=loss,
                    acc=jnp.mean((pred == labels).astype(jnp.float32)),
                    cos_sim_acc=jnp.mean((cs >= 0.95).astype(jnp.float32)))

    return step
