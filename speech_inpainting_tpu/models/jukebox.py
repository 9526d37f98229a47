"""Jukebox-style strided conv Encoder/Decoder + dilated Resnet1D (flax).

Behavior matched to the reference f0/content VQVAE conv stacks
(I_da/src/modules/jukebox.py:11-332, resnet.py:30-97 — code new):
  Encoder level: [Conv1d(k=2s|2s+1, stride s) + Resnet1D]×down_t + Conv1d(3,1,1)
  Decoder level: Conv1d(3,1,1) + [Resnet1D(reversed dilation) + ConvTranspose1d]×down_t
  Resnet1D block: x + scale·[ReLU → Conv1d(k3, dilation d) → ReLU → Conv1d(k1)]
with dilation d = growth_rate^depth (optionally cycled), reversed in decoders.

Only the int-valued (down_t, stride_t) configuration is implemented — the
only one the reference configs use (configs/*/f0_vqvae.json: downs_t [4],
strides_t [2]).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import jax
from flax import linen as nn

from .common import TorchConv1d, TorchConvTranspose1d


@dataclasses.dataclass(frozen=True)
class ConvStackConfig:
    """One Encoder/Decoder parameterization (reference **block_kwargs)."""
    input_emb_width: int = 1
    output_emb_width: int = 128
    levels: int = 1
    downs_t: Tuple[int, ...] = (4,)
    strides_t: Tuple[int, ...] = (2,)
    width: int = 32
    depth: int = 4
    m_conv: float = 1.0
    dilation_growth_rate: int = 3
    dilation_cycle: Optional[int] = None
    zero_out: bool = False
    res_scale: bool = False
    reverse_decoder_dilation: bool = False

    @staticmethod
    def from_dict(d: dict) -> "ConvStackConfig":
        d = dict(d)
        d["downs_t"] = tuple(d.get("downs_t", (4,)))
        d["strides_t"] = tuple(d.get("strides_t", (2,)))
        return ConvStackConfig(**{k: v for k, v in d.items()
                                  if k in ConvStackConfig.__dataclass_fields__})

    @property
    def total_stride(self) -> int:
        out = 1
        for s, d in zip(self.strides_t, self.downs_t):
            out *= s ** d
        return out


class ResConv1DBlock(nn.Module):
    n_in: int
    n_state: int
    dilation: int = 1
    zero_out: bool = False
    res_scale: float = 1.0

    @nn.compact
    def __call__(self, x):
        h = jax.nn.relu(x)
        h = TorchConv1d(self.n_state, 3, padding=self.dilation,
                        dilation=self.dilation, name="conv3")(h)
        h = jax.nn.relu(h)
        h = TorchConv1d(self.n_in, 1, zero_init=self.zero_out,
                        name="conv1")(h)
        return x + self.res_scale * h


class Resnet1D(nn.Module):
    n_in: int
    n_depth: int
    m_conv: float = 1.0
    dilation_growth_rate: int = 1
    dilation_cycle: Optional[int] = None
    zero_out: bool = False
    res_scale: bool = False
    reverse_dilation: bool = False

    @nn.compact
    def __call__(self, x):
        def depth_of(i):
            return i if self.dilation_cycle is None else i % self.dilation_cycle

        order = range(self.n_depth)
        scale = 1.0 if not self.res_scale else 1.0 / math.sqrt(self.n_depth)
        blocks = [
            ResConv1DBlock(self.n_in, int(self.m_conv * self.n_in),
                           dilation=self.dilation_growth_rate ** depth_of(i),
                           zero_out=self.zero_out, res_scale=scale,
                           name=f"block_{i}")
            for i in order]
        if self.reverse_dilation:
            blocks = blocks[::-1]
        for b in blocks:
            x = b(x)
        return x


def _filter_pad(stride: int) -> Tuple[int, int]:
    if stride % 2 == 0:
        return stride * 2, stride // 2
    return stride * 2 + 1, stride // 2 + 1


class EncoderConvBlock(nn.Module):
    """[strided Conv1d + Resnet1D]×down_t + Conv1d(3,1,1), one level."""
    cfg: ConvStackConfig
    in_width: int
    down_t: int
    stride_t: int

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        filt, pad = _filter_pad(self.stride_t)
        for i in range(self.down_t):
            x = TorchConv1d(cfg.width, filt, stride=self.stride_t,
                            padding=pad, name=f"down_{i}_conv")(x)
            x = Resnet1D(cfg.width, cfg.depth, cfg.m_conv,
                         cfg.dilation_growth_rate, cfg.dilation_cycle,
                         cfg.zero_out, cfg.res_scale,
                         name=f"down_{i}_resnet")(x)
        return TorchConv1d(cfg.output_emb_width, 3, padding=1,
                           name="proj")(x)


class DecoderConvBlock(nn.Module):
    """Conv1d(3,1,1) + [Resnet1D + ConvTranspose1d]×down_t, one level."""
    cfg: ConvStackConfig
    out_width: int
    down_t: int
    stride_t: int

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        filt, pad = _filter_pad(self.stride_t)
        x = TorchConv1d(cfg.width, 3, padding=1, name="proj")(x)
        for i in range(self.down_t):
            last = i == self.down_t - 1
            x = Resnet1D(cfg.width, cfg.depth, cfg.m_conv,
                         cfg.dilation_growth_rate, cfg.dilation_cycle,
                         cfg.zero_out, cfg.res_scale,
                         reverse_dilation=cfg.reverse_decoder_dilation,
                         name=f"up_{i}_resnet")(x)
            x = TorchConvTranspose1d(self.out_width if last else cfg.width,
                                     filt, stride=self.stride_t, padding=pad,
                                     name=f"up_{i}_convt")(x)
        return x


class Encoder(nn.Module):
    """(B, input_emb_width, T) → list of per-level (B, output_emb_width, T/s)."""
    cfg: ConvStackConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        xs = []
        for level in range(cfg.levels):
            x = EncoderConvBlock(
                cfg,
                in_width=cfg.input_emb_width if level == 0
                else cfg.output_emb_width,
                down_t=cfg.downs_t[level], stride_t=cfg.strides_t[level],
                name=f"level_{level}")(x)
            xs.append(x)
        return xs


class Decoder(nn.Module):
    """List of per-level latents → (B, input_emb_width, T). Mirrors the
    reference Decoder including the inter-level skip additions."""
    cfg: ConvStackConfig

    @nn.compact
    def __call__(self, xs, all_levels: bool = True):
        cfg = self.cfg
        assert len(xs) == (cfg.levels if all_levels else 1)
        x = xs[-1]
        for level in reversed(range(cfg.levels)):
            x = DecoderConvBlock(
                cfg, out_width=cfg.output_emb_width,
                down_t=cfg.downs_t[level], stride_t=cfg.strides_t[level],
                name=f"level_{level}")(x)
            if level != 0 and all_levels:
                x = x + xs[level - 1]
        return TorchConv1d(cfg.input_emb_width, 3, padding=1, name="out")(x)
