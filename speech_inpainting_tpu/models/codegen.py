"""I_da decoder-adaptation models: FoVQVAE and the unit-conditioned
CodeGenerator (flax).

Behavior matched to I_da/src/model.py:10-189 (code new):
  - FoVQVAE: jukebox Encoder → EMA-VQ Bottleneck → jukebox Decoder over f0
    series (1 channel, 5 ms hop).
  - CodeGenerator: content-unit Embedding(num_embeddings→embedding_dim),
    frozen FoVQVAE encode → pitch-unit Embedding(l_bins→embedding_dim),
    speaker embedding (external d-vector or Embedding table), repeat-upsample
    to the longest stream, channel concat (model_in_dim) → HiFi-GAN Generator.

The repeat-upsample (`_upsample`, model.py:78-119) requires the target length
be an integer multiple of the source length — guaranteed by the reference's
LCM length-matching (src/multiseries.py); shapes are static under jit so the
ratio folds into the compiled program.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..quantize.vq import Bottleneck
from .common import Embed
from .hifigan import Generator, HiFiGANConfig
from .jukebox import ConvStackConfig, Decoder, Encoder


@dataclasses.dataclass(frozen=True)
class FoVQVAEConfig:
    encoder: ConvStackConfig = ConvStackConfig()
    decoder: ConvStackConfig = ConvStackConfig()
    l_bins: int = 20
    emb_width: int = 128
    mu: float = 0.99
    levels: int = 1

    @staticmethod
    def from_dict(h: dict) -> "FoVQVAEConfig":
        vq = h["f0_vq_params"]
        return FoVQVAEConfig(
            encoder=ConvStackConfig.from_dict(h["f0_encoder_params"]),
            decoder=ConvStackConfig.from_dict(h["f0_decoder_params"]),
            l_bins=vq["l_bins"], emb_width=vq["emb_width"],
            mu=vq.get("mu", 0.99), levels=vq.get("levels", 1))


class FoVQVAE(nn.Module):
    """f0 (B, 1, T) → (reconstruction, commit losses, metrics)."""
    cfg: FoVQVAEConfig
    axis_name: Optional[str] = None

    def setup(self):
        self.encoder = Encoder(self.cfg.encoder)
        self.vq = Bottleneck(self.cfg.levels, self.cfg.l_bins,
                             self.cfg.emb_width, self.cfg.mu,
                             axis_name=self.axis_name)
        self.decoder = Decoder(self.cfg.decoder)

    def __call__(self, f0, *, train: bool = False):
        hs = self.encoder(f0)
        _, h_q, commits, metrics = self.vq(hs, train=train)
        out = self.decoder(h_q)
        return out, commits, metrics

    def encode_units(self, f0):
        """f0 → discrete pitch units (B, frames): the CodeGenerator tap
        (model.py:148-154, eval mode, detached)."""
        hs = self.encoder(f0)
        zs = self.vq.encode(hs)
        return zs[0]


@dataclasses.dataclass(frozen=True)
class CodeGeneratorConfig:
    hifigan: HiFiGANConfig
    num_embeddings: int = 100          # content-unit vocabulary (100/500)
    embedding_dim: int = 128
    multispkr: bool = True
    use_f0: bool = True                # reference h.f0_stats truthiness
    spk_embeddings: int = 200          # Embedding-table speaker path
    external_speaker_emb: bool = True  # d-vector `emb` input vs `spkr` ids
    f0_quantizer: Optional[FoVQVAEConfig] = None
    # content-VQVAE regime (reference h.lambda_commit_code truthy,
    # model.py:54-59): learn the content codebook jointly instead of the
    # unit-embedding lookup
    code_encoder: Optional[ConvStackConfig] = None
    code_vq_bins: int = 100
    code_vq_width: int = 128
    code_vq_mu: float = 0.99

    @staticmethod
    def from_dict(h: dict) -> "CodeGeneratorConfig":
        code_enc = None
        if h.get("lambda_commit_code"):
            code_enc = ConvStackConfig.from_dict(h["code_encoder_params"])
        vq = h.get("code_vq_params") or {}
        return CodeGeneratorConfig(
            hifigan=HiFiGANConfig.from_dict(h),
            num_embeddings=h["num_embeddings"],
            embedding_dim=h["embedding_dim"],
            multispkr=bool(h.get("multispkr")),
            use_f0=bool(h.get("f0_stats")),
            f0_quantizer=(FoVQVAEConfig.from_dict(h["f0_quantizer"])
                          if h.get("f0_quantizer") else None),
            code_encoder=code_enc,
            code_vq_bins=vq.get("l_bins", 100),
            code_vq_width=vq.get("emb_width", 128),
            code_vq_mu=vq.get("mu", 0.99))


def repeat_upsample(signal, max_frames: int):
    """Reference `_upsample` (model.py:78-119): repeat each frame
    max_frames//T times. signal: (B, C, T) | (B, C) | (B,)."""
    if signal.ndim == 2:
        signal = signal[:, :, None]
    elif signal.ndim == 1:
        signal = signal[:, None, None]
    b, c, t = signal.shape
    if max_frames % t != 0:
        raise NotImplementedError(
            "misalignment between condition features "
            f"(target {max_frames} not a multiple of source {t})")
    return jnp.repeat(signal, max_frames // t, axis=2)


class CodeGenerator(nn.Module):
    """(code, f0, emb|spkr) → waveform. The fo_vqvae submodule is frozen:
    its outputs are stop_gradient'ed (reference loads it eval-mode,
    model.py:148-154); exclude `fo_vqvae` params from the optimizer."""
    cfg: CodeGeneratorConfig

    def setup(self):
        cfg = self.cfg
        if cfg.code_encoder is not None:
            # content-VQVAE regime (model.py:54-59): encoder + EMA-VQ replace
            # the unit-embedding lookup
            self.code_encoder = Encoder(cfg.code_encoder)
            self.code_vq = Bottleneck(1, cfg.code_vq_bins, cfg.code_vq_width,
                                      cfg.code_vq_mu)
        else:
            self.emb_c = Embed(cfg.num_embeddings, cfg.embedding_dim)
        if cfg.f0_quantizer is not None:
            self.fo_vqvae = FoVQVAE(cfg.f0_quantizer)
            self.emb_p = Embed(cfg.f0_quantizer.l_bins, cfg.embedding_dim)
        if cfg.multispkr and not cfg.external_speaker_emb:
            self.emb_s = Embed(cfg.spk_embeddings, cfg.embedding_dim)
        self.generator = Generator(cfg.hifigan)

    def encode_codes(self, x):
        """Waveform/features (B, C, T) → content units (B, frames) via the
        learned content VQ (scripts/infer_vqvae_codes.py path)."""
        hs = self.code_encoder(x)
        return self.code_vq.encode(hs)[0]

    def _content_vq(self, code, train: bool):
        """Content-VQ forward (model.py:134-141): int inputs dequantize
        through the codebook; continuous inputs run encoder + VQ and return
        the commit loss."""
        if jnp.issubdtype(code.dtype, jnp.integer):
            blk = self.code_vq.level_blocks[0]
            return blk.decode(code), None, {}
        hs = self.code_encoder(code)
        _, h_q, commits, metrics = self.code_vq(hs, train=train)
        return h_q[0], commits[0], (metrics[0] if metrics else {})

    def __call__(self, code, f0=None, emb=None, spkr=None,
                 train: bool = False):
        """code (B, F) int (or (B, C, T) float in the content-VQ regime);
        f0 (B, 1, Ff) float; emb (B, E) float d-vector or spkr (B,)/(B,1)
        int ids. Returns (B, 1, T) waveform — plus (commit_loss, metrics)
        in the content-VQ regime, mirroring model.py:181-185."""
        cfg = self.cfg
        commit = None
        if cfg.code_encoder is not None:
            emb_c, commit, vq_metrics = self._content_vq(code, train)
        else:
            emb_c = jnp.swapaxes(self.emb_c(code), 1, 2)  # (B, D, F)
        feats = emb_c
        if cfg.code_encoder is not None:
            # content-VQ regime returns early: concat any extra conditioning
            # (e.g. a d-vector) and emit (wav, commit, metrics)
            # (model.py:173-185; these configs run without f0/speaker paths)
            if emb is not None:
                feats = jnp.concatenate(
                    [feats, repeat_upsample(emb, feats.shape[-1])], axis=1)
            return self.generator(feats), commit, vq_metrics
        if cfg.use_f0:
            z_p = jax.lax.stop_gradient(self.fo_vqvae.encode_units(f0))
            emb_p = jnp.swapaxes(self.emb_p(z_p), 1, 2)   # (B, D, Fp)
            if emb_c.shape[-1] < emb_p.shape[-1]:
                emb_c = repeat_upsample(emb_c, emb_p.shape[-1])
            else:
                emb_p = repeat_upsample(emb_p, emb_c.shape[-1])
            feats = jnp.concatenate([emb_c, emb_p], axis=1)
        if cfg.multispkr:
            if cfg.external_speaker_emb:
                if emb is None:
                    raise ValueError(
                        "multispkr with external_speaker_emb=True requires "
                        "an `emb` d-vector input")
                emb_s = emb
            else:
                ids = spkr.reshape(spkr.shape[0])
                emb_s = self.emb_s(ids)
            emb_s = repeat_upsample(emb_s, feats.shape[-1])
            feats = jnp.concatenate([feats, emb_s], axis=1)
        return self.generator(feats)
