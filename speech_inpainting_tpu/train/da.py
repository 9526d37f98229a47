"""I_da decoder-adaptation training: unit-conditioned HiFi-GAN GAN step.

Behavior matched to I_da/scripts/train.py:99-442 (code new): the generator is
`models.codegen.CodeGenerator` fed dict batches (code/f0/emb|spkr), the mel
loss uses the 16 kHz full-band mel, and the frozen FoVQVAE pitch quantizer is
excluded from the optimizer (torch skips requires_grad=False params; here
optax.set_to_zero over the 'fo_vqvae' subtree + stop_gradient in the model).
"""
from __future__ import annotations

import dataclasses

from ..models.codegen import CodeGenerator, CodeGeneratorConfig
from ..ops.mel import VOCODER_MEL_16K_FULLBAND, MelConfig, mel_spectrogram
from .gan import GANConfig, create_gan_state, make_gan_step


@dataclasses.dataclass(frozen=True)
class DATrainConfig:
    codegen: CodeGeneratorConfig
    gan: GANConfig = GANConfig(frozen_g_paths=("fo_vqvae",))
    mel_loss: MelConfig = VOCODER_MEL_16K_FULLBAND
    segment_size: int = 8960
    code_hop_size: int = 320


def make_da_step(cfg: DATrainConfig, vq_tree):
    """batch = {'code': (B,F) int32, 'f0': (B,1,Ff), 'emb': (B,E) or
    'spkr': (B,), 'audio': (B,1,S)}; 'mel_loss' optional (else in-graph).

    `vq_tree` is the frozen pitch quantizer's codebook state (from
    convert_fo_vqvae / FoVQVAE training) — tiny, closed over as a constant.
    """
    codegen = CodeGenerator(cfg.codegen)
    content_vq = cfg.codegen.code_encoder is not None

    def gen_fwd(g_params, batch):
        out = codegen.apply(
            {"params": g_params, "vq": vq_tree}, batch["code"],
            f0=batch.get("f0"), emb=batch.get("emb"), spkr=batch.get("spkr"))
        if content_vq:
            # (wav, commit, metrics): λ_commit trains the content encoder
            # through the commit term; the EMA codebook itself is refreshed
            # between epochs (offline re-estimation) rather than per-step
            wav, commit, _ = out
            return wav, commit
        return out

    return make_gan_step(gen_fwd,
                         lambda w: mel_spectrogram(w, cfg.mel_loss), cfg.gan)


__all__ = ["DATrainConfig", "GANConfig", "create_gan_state", "make_da_step"]
