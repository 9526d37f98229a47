"""Convert I_da torch checkpoints (FoVQVAE g_*, CodeGenerator g_*) → flax.

Reference formats (SURVEY.md §5.4):
  f0-VQVAE g_*:    {'generator': FoVQVAE sd, 'optim_g', 'steps', 'epoch'}
  CodeGenerator g_*: {'generator': sd}  (HiFi-GAN keys at top level — the
                     class subclasses Generator — plus emb_c/emb_p/emb_s/
                     fo_vqvae.* and jukebox conv stacks)

VQ codebooks: only `k` is a registered buffer in the reference
(vq.py:22); k_sum/k_elem are rebuilt at load time by restore_k()
(vq.py:45-55) — the converter mirrors that reconstruction.

Jukebox Sequential indices map as:
  encoder level: model.{i}.0 (strided conv), model.{i}.1 (Resnet1D),
                 model.{down_t} (final conv)
  decoder level: model.0 (proj conv), model.{1+i}.0 (Resnet1D),
                 model.{1+i}.1 (ConvTranspose1d)
  ResConv1DBlock: model.1 (k3 conv), model.3 (k1 conv)
Reversed decoder dilation stores blocks reversed; we index accordingly.
"""
from __future__ import annotations

import numpy as np

from ..models.codegen import CodeGeneratorConfig, FoVQVAEConfig
from ..models.jukebox import ConvStackConfig
from .hifigan_torch import convert_generator


def _np(t):
    # copy: .numpy() would alias torch storage, which later in-place
    # optimizer updates on the source module would silently mutate
    if hasattr(t, "detach"):
        return t.detach().cpu().numpy().copy()
    return np.array(t)


def _conv(sd, prefix):
    p = {"w": _np(sd[f"{prefix}.weight"])}
    if f"{prefix}.bias" in sd:
        p["b"] = _np(sd[f"{prefix}.bias"])
    return p


def _resnet(sd, prefix, cfg: ConvStackConfig, reverse: bool) -> dict:
    out = {}
    for i in range(cfg.depth):
        j = cfg.depth - 1 - i if reverse else i
        out[f"block_{i}"] = {
            "conv3": _conv(sd, f"{prefix}.model.{j}.model.1"),
            "conv1": _conv(sd, f"{prefix}.model.{j}.model.3"),
        }
    return out


def convert_encoder(sd: dict, prefix: str, cfg: ConvStackConfig) -> dict:
    params = {}
    for level in range(cfg.levels):
        base = f"{prefix}level_blocks.{level}.model"
        lp = {}
        d = cfg.downs_t[level]
        for i in range(d):
            lp[f"down_{i}_conv"] = _conv(sd, f"{base}.{i}.0")
            lp[f"down_{i}_resnet"] = _resnet(sd, f"{base}.{i}.1", cfg, False)
        lp["proj"] = _conv(sd, f"{base}.{d}")
        params[f"level_{level}"] = lp
    return params


def convert_decoder(sd: dict, prefix: str, cfg: ConvStackConfig) -> dict:
    params = {}
    for level in range(cfg.levels):
        base = f"{prefix}level_blocks.{level}.model"
        lp = {"proj": _conv(sd, f"{base}.0")}
        for i in range(cfg.downs_t[level]):
            lp[f"up_{i}_resnet"] = _resnet(sd, f"{base}.{1 + i}.0", cfg,
                                           cfg.reverse_decoder_dilation)
            lp[f"up_{i}_convt"] = _conv(sd, f"{base}.{1 + i}.1")
        params[f"level_{level}"] = lp
    params["out"] = _conv(sd, f"{prefix}out")
    return params


def convert_bottleneck_vars(sd: dict, prefix: str, levels: int) -> dict:
    """VQ buffers → 'vq' collection (restore_k reconstruction)."""
    out = {}
    for level in range(levels):
        k = _np(sd[f"{prefix}level_blocks.{level}.k"])
        out[f"level_{level}"] = {
            "k": k, "k_sum": k.copy(),
            "k_elem": np.ones((k.shape[0],), np.float32),
            "initted": np.ones((), bool),
        }
    return out


def convert_fo_vqvae(sd: dict, cfg: FoVQVAEConfig, prefix: str = ""):
    """FoVQVAE state dict → (params, vq_tree). Apply with
    variables = {"params": params, "vq": vq_tree}."""
    params = {
        "encoder": convert_encoder(sd, f"{prefix}encoder.", cfg.encoder),
        "decoder": convert_decoder(sd, f"{prefix}decoder.", cfg.decoder),
    }
    vq_tree = {"vq": convert_bottleneck_vars(sd, f"{prefix}vq.", cfg.levels)}
    return params, vq_tree


def convert_code_generator(sd: dict, cfg: CodeGeneratorConfig):
    """CodeGenerator state dict → (params, vq_tree) for models.codegen.
    Apply with variables = {"params": params, "vq": vq_tree}."""
    params = {"generator": convert_generator(sd, cfg.hifigan)}
    vq_tree = {}
    if cfg.code_encoder is not None:
        # content-VQVAE regime (model.py:54-59): emb_c is None in the
        # reference; the content encoder + EMA codebook replace it
        params["code_encoder"] = convert_encoder(sd, "code_encoder.",
                                                 cfg.code_encoder)
        vq_tree["code_vq"] = convert_bottleneck_vars(sd, "code_vq.", 1)
    else:
        params["emb_c"] = {"weight": _np(sd["emb_c.weight"])}
    if cfg.f0_quantizer is not None:
        params["emb_p"] = {"weight": _np(sd["emb_p.weight"])}
        fo_params, fo_vq = convert_fo_vqvae(sd, cfg.f0_quantizer,
                                            prefix="fo_vqvae.")
        params["fo_vqvae"] = fo_params
        vq_tree["fo_vqvae"] = fo_vq
    if cfg.multispkr and not cfg.external_speaker_emb:
        params["emb_s"] = {"weight": _np(sd["emb_s.weight"])}
    return params, vq_tree


def load_fo_vqvae_checkpoint(path: str, cfg: FoVQVAEConfig):
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=True)
    return convert_fo_vqvae(ckpt["generator"], cfg)


def load_code_generator_checkpoint(path: str, cfg: CodeGeneratorConfig):
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=True)
    return convert_code_generator(ckpt["generator"], cfg)
