"""f0 VQ-VAE training: MSE reconstruction + λ·commitment, one jitted step.

Behavior matched to I_da/scripts/train_f0_vq.py:79-275 (code new): FoVQVAE
(jukebox encoder → EMA-VQ → jukebox decoder) trained with
AdamW(lr, betas (0.8, 0.99)) and per-epoch ExponentialLR; the EMA codebook
update runs inside the forward (mutable 'vq' collection) and syncs across a
mesh via psum when axis_name is set; metrics include codebook
entropy/usage/used_curr (the reference's TB scalars, :204-214).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..models.codegen import FoVQVAE, FoVQVAEConfig


@dataclasses.dataclass(frozen=True)
class F0VQConfig:
    model: FoVQVAEConfig = FoVQVAEConfig()
    learning_rate: float = 2e-4
    adam_b1: float = 0.8
    adam_b2: float = 0.99
    weight_decay: float = 0.01
    lr_decay: float = 0.999
    steps_per_epoch: int = 1000
    lambda_commit: float = 0.02
    axis_name: Optional[str] = None


class F0VQTrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    vq: Any
    opt_state: Any


def _opt(cfg: F0VQConfig) -> optax.GradientTransformation:
    sched = optax.exponential_decay(
        init_value=cfg.learning_rate, transition_steps=cfg.steps_per_epoch,
        decay_rate=cfg.lr_decay, staircase=True)
    return optax.adamw(sched, b1=cfg.adam_b1, b2=cfg.adam_b2,
                       weight_decay=cfg.weight_decay)


def create_f0vq_state(cfg: F0VQConfig, params, vq_tree) -> F0VQTrainState:
    return F0VQTrainState(step=jnp.zeros((), jnp.int32), params=params,
                          vq=vq_tree, opt_state=_opt(cfg).init(params))


def make_f0vq_step(cfg: F0VQConfig):
    """step(state, batch{'f0': (B,1,T)}, rng) -> (state, metrics)."""
    model = FoVQVAE(cfg.model, axis_name=cfg.axis_name)
    opt = _opt(cfg)

    def loss_fn(params, vq, f0, rng):
        (out, commits, metrics), upd = model.apply(
            {"params": params, "vq": vq}, f0, train=True,
            rngs={"vq": rng}, mutable=["vq"])
        recon = jnp.mean(jnp.square(out - f0))
        commit = sum(commits)
        loss = recon + cfg.lambda_commit * commit
        m = dict(loss=loss, recon=recon, commit=commit)
        for k in ("entropy", "usage", "used_curr", "fit"):
            if metrics and k in metrics[0]:
                m[k] = metrics[0][k]
        return loss, (upd["vq"], m)

    def step(state: F0VQTrainState, batch, rng):
        (_, (vq, metrics)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.vq, batch["f0"], rng)
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return F0VQTrainState(step=state.step + 1, params=params, vq=vq,
                              opt_state=opt_state), metrics

    return step


def make_f0vq_eval(cfg: F0VQConfig):
    model = FoVQVAE(cfg.model)

    @jax.jit
    def step(params, vq_tree, f0):
        out, commits, _ = model.apply({"params": params, "vq": vq_tree},
                                      f0, train=False)
        return dict(recon=jnp.mean(jnp.square(out - f0)),
                    commit=sum(commits))

    return step
