"""GAN training step (HiFi-GAN / CodeGenerator): D-then-G in one jitted fn.

Reproduces the reference schedule exactly (I_ea/hifi_gan/train.py:148-186,
I_da/scripts/train.py:243-297 — code new):
  1. one generator forward ŷ
  2. D step: LSGAN loss on (y, stop_grad(ŷ)) for MPD+MSD, AdamW update
  3. G step: adv + feature-matching + mel-L1×45 (+ λ·commit) computed on the
     SAME ŷ but against the UPDATED discriminators; gradients flow to the
     generator through a jax.vjp of the single forward — one fwd + one bwd
     per step, exactly the reference's FLOP count, fully fused under jit.

Optimizers: AdamW(lr, betas (0.8, 0.99), torch-default wd 0.01) ×2 with
per-epoch ExponentialLR decay (staircase schedule over steps_per_epoch).
MSD spectral-norm power-iteration state is threaded through both
discriminator phases ('spectral' collection), matching torch train mode.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct

from .. import losses
from ..models.hifigan import MultiPeriodDiscriminator, MultiScaleDiscriminator


@dataclasses.dataclass(frozen=True)
class GANConfig:
    learning_rate: float = 2e-4
    adam_b1: float = 0.8
    adam_b2: float = 0.99
    weight_decay: float = 0.01       # torch AdamW default
    lr_decay: float = 0.999          # per-epoch ExponentialLR gamma
    steps_per_epoch: int = 1000
    mel_weight: float = 45.0
    lambda_commit: float = 0.0       # I_da lambda_commit_code
    frozen_g_paths: tuple = ()       # top-level generator subtrees to freeze
                                     # (e.g. ("fo_vqvae",) — torch skips
                                     # requires_grad=False params entirely)
    batched_disc: bool = False       # run (real, fake) through each
                                     # weight-norm discriminator as ONE 2B
                                     # forward — bit-identical outputs,
                                     # fewer launches at small shapes
    folded_mpd: bool = False         # MPD period fold laid out (B,C,p,T/p)
                                     # — long axis on the TPU lanes; same
                                     # params/losses (models/hifigan.py
                                     # DiscriminatorP.fold_periods)
    skip_nonfinite: int = 0          # >0: never apply nan/inf-grad updates;
                                     # loop aborts after N consecutive skips
                                     # (see _guard / train/guard.py)
    disc_bf16: bool = False          # discriminator convs compute in bf16
                                     # (params stay f32; losses reduce in
                                     # f32). The step is memory-bound and
                                     # the discs own ~half its bytes
                                     # (BENCH_TRAIN_r03.json attribution),
                                     # so this halves the dominant traffic.


class GANTrainState(struct.PyTreeNode):
    step: jnp.ndarray
    g_params: Any
    d_params: Any                    # {"mpd": ..., "msd": ...}
    spectral: Any                    # MSD spectral-norm u/v state
    g_opt: Any
    d_opt: Any
    vq: Any = None                   # generator 'vq' collection (EMA codebooks)
    rng: Any = None                  # PRNG key for in-step VQ restarts


def _guard(cfg: GANConfig, opt) -> optax.GradientTransformation:
    """skip_nonfinite>0 wraps the optimizer so updates whose grads contain
    nan/inf are NEVER applied (params and moments untouched —
    train/guard.py, which unlike optax.apply_if_finite never 'gives up and
    accepts'); the training loop aborts loudly once the consecutive-skip
    counter exceeds the budget (RunConfig.abort_nonfinite). A production
    guard the reference lacks (one bad batch NaNs its run). Changes the
    opt_state pytree: flip only on fresh runs, not mid-restore."""
    if not cfg.skip_nonfinite:
        return opt
    from .guard import skip_if_nonfinite
    return skip_if_nonfinite(opt)


def _adamw(cfg: GANConfig) -> optax.GradientTransformation:
    sched = optax.exponential_decay(
        init_value=cfg.learning_rate, transition_steps=cfg.steps_per_epoch,
        decay_rate=cfg.lr_decay, staircase=True)
    return optax.adamw(sched, b1=cfg.adam_b1, b2=cfg.adam_b2,
                       weight_decay=cfg.weight_decay)


def _make_opt(cfg: GANConfig) -> optax.GradientTransformation:
    return _guard(cfg, _adamw(cfg))


def _make_g_opt(cfg: GANConfig) -> optax.GradientTransformation:
    if not cfg.frozen_g_paths:
        return _make_opt(cfg)

    def labels(params):
        def lab(path, _):
            top = path[0].key if hasattr(path[0], "key") else str(path[0])
            return "frozen" if top in cfg.frozen_g_paths else "train"
        return jax.tree_util.tree_map_with_path(lab, params)

    return _guard(cfg, optax.multi_transform(
        {"train": _adamw(cfg), "frozen": optax.set_to_zero()}, labels))


def create_gan_state(cfg: GANConfig, g_params, mpd_params, msd_params,
                     spectral, *, vq=None, rng=None) -> GANTrainState:
    return GANTrainState(
        step=jnp.zeros((), jnp.int32), g_params=g_params,
        d_params={"mpd": mpd_params, "msd": msd_params}, spectral=spectral,
        g_opt=_make_g_opt(cfg).init(g_params),
        d_opt=_make_opt(cfg).init({"mpd": mpd_params, "msd": msd_params}),
        vq=vq, rng=rng)


def make_gan_step(generator_fwd: Callable, mel_fn: Callable, cfg: GANConfig,
                  *, stateful_vq: bool = False, mpd=None, msd=None):
    """Build step(state, batch) -> (state, metrics).

    generator_fwd(g_params, batch) -> ŷ (B, 1, T) or (ŷ, commit_loss).
    With stateful_vq=True the generator carries mutable EMA-VQ codebooks
    updated every forward (the reference's joint enc-VQ-dec regime,
    I_da/src/modules/vq.py:57-90 driven from scripts/train.py:99-112):
    generator_fwd(g_params, vq, rng, batch) -> (ŷ, commit_loss, new_vq),
    and state.vq / state.rng must be set. The codebook update is a
    no-grad side effect (torch updates under no_grad) — it rides the
    vjp as an aux output.
    mel_fn(wav (B, T)) -> loss mel (the full-band fmax_for_loss mel).
    batch must contain 'audio' (B, 1, T) ground truth; 'mel_loss'
    (B, n_mels, F) is used if present, else computed in-graph as
    mel_fn(audio) — the TPU-first default (no host mel precompute).
    mpd/msd: optional discriminator module overrides (reduced stacks keep
    integration-test compiles tractable; production uses the defaults).
    """
    ddt = jnp.bfloat16 if cfg.disc_bf16 else jnp.float32
    if (mpd is not None or msd is not None) and (cfg.disc_bf16
                                                 or cfg.folded_mpd):
        # module overrides carry their own dtype/layout — applying the
        # config flags silently to NOTHING would fake a null ablation
        raise ValueError("disc_bf16/folded_mpd have no effect on mpd/msd "
                         "module overrides; construct the overrides with "
                         "the desired dtype/fold_periods instead")
    mpd = mpd or MultiPeriodDiscriminator(fold_periods=cfg.folded_mpd,
                                          dtype=ddt)
    msd = msd or MultiScaleDiscriminator(dtype=ddt)
    g_opt, d_opt = _make_g_opt(cfg), _make_opt(cfg)
    has_commit = cfg.lambda_commit > 0 or stateful_vq

    def disc_apply(d_params, spectral, y, y_hat):
        pr, pg, pfr, pfg = mpd.apply({"params": d_params["mpd"]}, y, y_hat,
                                     cfg.batched_disc)
        (sr_, sg, sfr, sfg), new_spec = msd.apply(
            {"params": d_params["msd"], "spectral": spectral}, y, y_hat,
            True, cfg.batched_disc, mutable=["spectral"])
        return (pr, pg, pfr, pfg), (sr_, sg, sfr, sfg), new_spec["spectral"]

    def step(state: GANTrainState, batch):
        y = batch["audio"]
        mel_gt = batch["mel_loss"] if "mel_loss" in batch else mel_fn(y[:, 0])

        if stateful_vq:
            next_rng, step_rng = jax.random.split(state.rng)
        else:
            next_rng = step_rng = state.rng

        # ---- 1. single generator forward, with a reusable vjp ----------
        def fwd(gp):
            if stateful_vq:
                y_hat, commit, new_vq = generator_fwd(gp, state.vq, step_rng,
                                                      batch)
                return (y_hat, commit), new_vq
            out = generator_fwd(gp, batch)
            if has_commit:
                return out, None
            return (out, jnp.zeros(())), None
        (y_hat, commit), gen_vjp, new_vq = jax.vjp(fwd, state.g_params,
                                                   has_aux=True)

        # ---- 2. discriminator update on stop_grad(ŷ) -------------------
        y_hat_sg = jax.lax.stop_gradient(y_hat)

        def d_loss_fn(d_params):
            (pr, pg, _, _), (sr_, sg, _, _), new_spec = disc_apply(
                d_params, state.spectral, y, y_hat_sg)
            loss_f, _, _ = losses.discriminator_loss(pr, pg)
            loss_s, _, _ = losses.discriminator_loss(sr_, sg)
            return loss_f + loss_s, new_spec

        (d_loss, spec1), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True)(state.d_params)
        d_updates, d_opt_state = d_opt.update(d_grads, state.d_opt,
                                              state.d_params)
        d_params = optax.apply_updates(state.d_params, d_updates)

        # ---- 3. generator losses vs the UPDATED discriminators ---------
        def g_loss_fn(y_hat, commit):
            mel_estim = mel_fn(y_hat[:, 0])
            (_, pg, pfr, pfg), (_, sg, sfr, sfg), spec2 = disc_apply(
                d_params, spec1, y, y_hat)
            loss_gen_f, _ = losses.generator_loss(pg)
            loss_gen_s, _ = losses.generator_loss(sg)
            loss_fm_f = losses.feature_loss(pfr, pfg)
            loss_fm_s = losses.feature_loss(sfr, sfg)
            loss_mel = cfg.mel_weight * jnp.mean(jnp.abs(mel_gt - mel_estim))
            total = loss_gen_f + loss_gen_s + loss_fm_f + loss_fm_s + loss_mel
            if has_commit:
                total = total + cfg.lambda_commit * commit
            aux = dict(mel_error=loss_mel / cfg.mel_weight,
                       gen_f=loss_gen_f, gen_s=loss_gen_s,
                       fm_f=loss_fm_f, fm_s=loss_fm_s, spectral=spec2)
            return total, aux

        (g_loss, aux), (y_hat_bar, commit_bar) = jax.value_and_grad(
            g_loss_fn, argnums=(0, 1), has_aux=True)(y_hat, commit)
        (g_grads,) = gen_vjp((y_hat_bar, commit_bar))
        g_updates, g_opt_state = g_opt.update(g_grads, state.g_opt,
                                              state.g_params)
        g_params = optax.apply_updates(state.g_params, g_updates)

        spectral = aux.pop("spectral")
        metrics = dict(loss_gen_all=g_loss, loss_disc=d_loss, **aux)
        if has_commit:
            metrics["commit"] = commit
        vq = new_vq if stateful_vq else state.vq
        if cfg.skip_nonfinite:
            metrics["nonfinite_skips"] = jnp.maximum(
                g_opt_state.notfinite_count, d_opt_state.notfinite_count)
            if stateful_vq:
                # the EMA codebooks update in-forward (quantize/vq.py), out
                # of the optimizers' sight — gate them on their own
                # finiteness so a nan batch can't poison state.vq
                from .guard import tree_if_finite
                vq = tree_if_finite(new_vq, state.vq)
        new_state = GANTrainState(step=state.step + 1, g_params=g_params,
                                  d_params=d_params, spectral=spectral,
                                  g_opt=g_opt_state, d_opt=d_opt_state,
                                  vq=vq, rng=next_rng)
        return new_state, metrics

    return step


def make_gan_eval(generator_fwd: Callable, mel_fn: Callable):
    """Validation metric for the GAN loops: generator-only forward, val mel
    error = L1(mel(ŷ), loss mel) — the quantity the reference's validation
    sweeps log (I_ea/hifi_gan/train.py:218-246 val_err,
    I_da/scripts/train.py:362-385). generator_fwd(g_params, batch) → ŷ (or a
    tuple whose first element is ŷ), as in make_gan_step's decoder-only
    signature; jit the result and drive it from run_gan_training's
    valid_fn."""
    def eval_fn(g_params, batch):
        y = batch["audio"]
        mel_gt = batch["mel_loss"] if "mel_loss" in batch else mel_fn(y[:, 0])
        out = generator_fwd(g_params, batch)
        y_hat = out[0] if isinstance(out, tuple) else out
        return {"mel_error": jnp.mean(jnp.abs(mel_gt - mel_fn(y_hat[:, 0])))}
    return eval_fn
