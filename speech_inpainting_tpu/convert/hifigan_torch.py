"""Convert reference PyTorch HiFi-GAN checkpoints → flax variable trees.

Handles the reference's checkpoint formats (SURVEY.md §5.4):
  g_{step:08d}  = {'generator': state_dict}
  do_{step:08d} = {'mpd': sd, 'msd': sd, 'optim_g', 'optim_d', 'steps', 'epoch'}
and both torch weight-norm key styles (legacy `weight_g/weight_v` and the
parametrizations API `parametrizations.weight.original0/original1`).

Because our flax modules keep torch parameter layouts, every map here is a
rename + reshape of `g` from (O,1,1) to (O,).
"""
from __future__ import annotations

import numpy as np

from ..models.hifigan import HiFiGANConfig


def _np(t):
    # copy: .numpy() would alias torch storage, which later in-place
    # optimizer updates on the source module would silently mutate
    if hasattr(t, "detach"):
        return t.detach().cpu().numpy().copy()
    return np.array(t)


def _wn_params(sd: dict, prefix: str, transpose_g: bool = False) -> dict:
    """Extract weight-norm conv params at `prefix` from a torch state dict."""
    if f"{prefix}.weight_g" in sd:
        g = _np(sd[f"{prefix}.weight_g"])
        v = _np(sd[f"{prefix}.weight_v"])
    elif f"{prefix}.parametrizations.weight.original0" in sd:
        g = _np(sd[f"{prefix}.parametrizations.weight.original0"])
        v = _np(sd[f"{prefix}.parametrizations.weight.original1"])
    else:
        raise KeyError(f"no weight-norm params under '{prefix}'")
    out = {"v": v, "g": g.reshape(-1)}
    bias = sd.get(f"{prefix}.bias")
    if bias is not None:
        out["b"] = _np(bias)
    return out


def _sn_params(sd: dict, prefix: str):
    """Extract spectral-norm conv params (weight_orig + power-iter u)."""
    if f"{prefix}.weight_orig" in sd:
        w = _np(sd[f"{prefix}.weight_orig"])
        u = _np(sd[f"{prefix}.weight_u"])
        v = _np(sd[f"{prefix}.weight_v"])
    elif f"{prefix}.parametrizations.weight.original" in sd:
        w = _np(sd[f"{prefix}.parametrizations.weight.original"])
        u = _np(sd[f"{prefix}.parametrizations.weight._u"])
        v = _np(sd[f"{prefix}.parametrizations.weight._v"])
    else:
        raise KeyError(f"no spectral-norm params under '{prefix}'")
    p = {"w": w}
    bias = sd.get(f"{prefix}.bias")
    if bias is not None:
        p["b"] = _np(bias)
    return p, {"u": u, "v": v}


def convert_generator(sd: dict, cfg: HiFiGANConfig) -> dict:
    """torch Generator state_dict → flax params for models.hifigan.Generator."""
    nk = len(cfg.resblock_kernel_sizes)
    params = {"conv_pre": _wn_params(sd, "conv_pre"),
              "conv_post": _wn_params(sd, "conv_post")}
    for i in range(len(cfg.upsample_rates)):
        params[f"ups_{i}"] = _wn_params(sd, f"ups.{i}")
        for j in range(nk):
            flat = i * nk + j
            block = {}
            if cfg.resblock == "1":
                for k in range(len(cfg.resblock_dilation_sizes[j])):
                    block[f"convs1_{k}"] = _wn_params(sd, f"resblocks.{flat}.convs1.{k}")
                    block[f"convs2_{k}"] = _wn_params(sd, f"resblocks.{flat}.convs2.{k}")
            else:
                for k in range(len(cfg.resblock_dilation_sizes[j])):
                    block[f"convs_{k}"] = _wn_params(sd, f"resblocks.{flat}.convs.{k}")
            params[f"resblocks_{i}_{j}"] = block
    return params


def convert_mpd(sd: dict) -> dict:
    """torch MultiPeriodDiscriminator state_dict → flax params."""
    params = {}
    for i in range(5):
        d = {}
        for j in range(5):
            d[f"convs_{j}"] = _wn_params(sd, f"discriminators.{i}.convs.{j}")
        d["conv_post"] = _wn_params(sd, f"discriminators.{i}.conv_post")
        params[f"discriminators_{i}"] = d
    return params


def convert_msd(sd: dict):
    """torch MultiScaleDiscriminator state_dict → (params, spectral_vars)."""
    params, spectral = {}, {}
    for i in range(3):
        d, s = {}, {}
        for j in range(7):
            prefix = f"discriminators.{i}.convs.{j}"
            if i == 0:  # spectral norm discriminator
                d[f"convs_{j}"], s[f"convs_{j}"] = _sn_params(sd, prefix)
            else:
                d[f"convs_{j}"] = _wn_params(sd, prefix)
        if i == 0:
            d["conv_post"], s["conv_post"] = _sn_params(sd, f"discriminators.{i}.conv_post")
            spectral[f"discriminators_{i}"] = s
        else:
            d["conv_post"] = _wn_params(sd, f"discriminators.{i}.conv_post")
        params[f"discriminators_{i}"] = d
    return params, spectral


def load_generator_checkpoint(path: str, cfg: HiFiGANConfig) -> dict:
    """Load a reference g_* checkpoint file (torch.save format)."""
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=True)
    return convert_generator(ckpt["generator"], cfg)


def load_discriminator_checkpoint(path: str):
    """Load a reference do_* checkpoint file → (mpd_params, msd_params,
    msd_spectral, steps, epoch)."""
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=True)
    mpd = convert_mpd(ckpt["mpd"])
    msd, spectral = convert_msd(ckpt["msd"])
    return mpd, msd, spectral, int(ckpt.get("steps", 0)), int(ckpt.get("epoch", -1))
