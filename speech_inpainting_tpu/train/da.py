"""I_da decoder-adaptation training: unit-conditioned HiFi-GAN GAN step.

Behavior matched to I_da/scripts/train.py:99-442 (code new): the generator is
`models.codegen.CodeGenerator` fed dict batches (code/f0/emb|spkr), the mel
loss uses the 16 kHz full-band mel, and the frozen FoVQVAE pitch quantizer is
excluded from the optimizer (torch skips requires_grad=False params; here
optax.set_to_zero over the 'fo_vqvae' subtree + stop_gradient in the model).

Regimes (reference scripts/train.py:99-112 docstring):
  - decoder-only (unit-embedding lookup): vq holds only the frozen pitch
    codebook — constant through training.
  - joint enc-VQ-dec (h.lambda_commit_code truthy): the content EMA codebook
    updates EVERY generator forward (vq.py:57-90 update_k under no_grad) —
    threaded through GANTrainState.vq via make_gan_step(stateful_vq=True),
    with state.rng feeding the dead-code restart sampling. Under a dp-sharded
    jit the one-hot segment sums reduce globally (GSPMD inserts the psums the
    reference got from dist.all_reduce, vq.py:69-71).
"""
from __future__ import annotations

import dataclasses

import jax

from ..models.codegen import CodeGenerator, CodeGeneratorConfig
from ..ops.mel import VOCODER_MEL_16K_FULLBAND, MelConfig, mel_spectrogram
from .gan import (GANConfig, GANTrainState, create_gan_state,
                  make_gan_eval, make_gan_step)


@dataclasses.dataclass(frozen=True)
class DATrainConfig:
    codegen: CodeGeneratorConfig
    gan: GANConfig = GANConfig(frozen_g_paths=("fo_vqvae",))
    mel_loss: MelConfig = VOCODER_MEL_16K_FULLBAND
    segment_size: int = 8960
    code_hop_size: int = 320


def make_da_step(cfg: DATrainConfig, vq_tree=None, *, mpd=None, msd=None):
    """batch = {'code': (B,F) int32 (or (B,C,T) float in the joint regime),
    'f0': (B,1,Ff), 'emb': (B,E) or 'spkr': (B,), 'audio': (B,1,S)};
    'mel_loss' optional (else in-graph).

    Decoder-only regime: `vq_tree` is the frozen pitch quantizer's codebook
    state (from convert_fo_vqvae / FoVQVAE training) — tiny, closed over as a
    constant.

    Joint regime (cfg.codegen.code_encoder set): the FULL 'vq' collection
    (content codebook + any pitch codebook) lives in GANTrainState.vq and is
    EMA-updated per step — build the state with create_da_state and leave
    `vq_tree` None.

    mpd/msd: optional discriminator overrides forwarded to make_gan_step
    (reduced stacks for integration/dry-run compiles; production defaults).
    """
    codegen = CodeGenerator(cfg.codegen)
    content_vq = cfg.codegen.code_encoder is not None
    mel_fn = lambda w: mel_spectrogram(w, cfg.mel_loss)  # noqa: E731

    if content_vq:
        if vq_tree is not None:
            raise ValueError(
                "content-VQ (joint) regime: the 'vq' collection must live "
                "in GANTrainState.vq (create_da_state), not be closed over "
                "— passing vq_tree here would silently freeze it")
        def gen_fwd(g_params, vq, rng, batch):
            (wav, commit, _), upd = codegen.apply(
                {"params": g_params, "vq": vq}, batch["code"],
                f0=batch.get("f0"), emb=batch.get("emb"),
                spkr=batch.get("spkr"), train=True,
                mutable=["vq"], rngs={"vq": rng})
            return wav, commit, upd["vq"]

        return make_gan_step(gen_fwd, mel_fn, cfg.gan, stateful_vq=True,
                             mpd=mpd, msd=msd)

    def gen_fwd(g_params, batch):
        return codegen.apply(
            {"params": g_params, "vq": vq_tree}, batch["code"],
            f0=batch.get("f0"), emb=batch.get("emb"), spkr=batch.get("spkr"))

    return make_gan_step(gen_fwd, mel_fn, cfg.gan, mpd=mpd, msd=msd)


def da_gen_fwd(cfg: DATrainConfig):
    """Eval-mode generator forward for the decoder loops:
    gen_fwd((g_params, vq), batch) → ŷ (plus (commit, metrics) in the joint
    regime). The vq leg is the frozen pitch tree in the decoder-only regime,
    or state.vq in the joint regime (codebooks are train state); eval mode
    never updates it (vq.py eval path)."""
    codegen = CodeGenerator(cfg.codegen)

    def gen_fwd(params_and_vq, batch):
        g_params, vq = params_and_vq
        return codegen.apply(
            {"params": g_params, "vq": vq}, batch["code"],
            f0=batch.get("f0"), emb=batch.get("emb"), spkr=batch.get("spkr"))

    return gen_fwd


def make_da_eval(cfg: DATrainConfig):
    """Validation mel error for the decoder loops (the reference's val sweep,
    I_da/scripts/train.py:362-385): eval_fn((g_params, vq), batch) →
    {'mel_error'}."""
    return make_gan_eval(da_gen_fwd(cfg),
                         lambda w: mel_spectrogram(w, cfg.mel_loss))


def create_da_state(cfg: DATrainConfig, g_params, mpd_params, msd_params,
                    spectral, *, vq=None, seed: int = 1234) -> GANTrainState:
    """GAN state for the joint regime: vq = the generator's full 'vq'
    collection (from model.init or the checkpoint converter); the rng drives
    dead-code restart sampling (torch randperm, vq.py:66-68)."""
    return create_gan_state(cfg.gan, g_params, mpd_params, msd_params,
                            spectral, vq=vq, rng=jax.random.PRNGKey(seed))


__all__ = ["DATrainConfig", "GANConfig", "create_gan_state",
           "create_da_state", "make_da_step", "make_da_eval", "da_gen_fwd"]
