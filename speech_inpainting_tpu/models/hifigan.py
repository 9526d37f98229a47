"""HiFi-GAN generator + multi-period / multi-scale discriminators (flax).

TPU-first re-implementation of the reference architecture family
(I_ea/hifi_gan/models.py:12-255, I_da/src/models.py — behavior matched, code
new): transposed-conv upsampling with a multi-receptive-field (MRF) fusion of
dilated ResBlocks, LSGAN MPD/MSD discriminators. Supports both reference
configurations:
  - 80-mel input, upsample [8,8,2,2]x256 @ 22.05 kHz (config_v1.json)
  - 384-dim unit/f0/speaker input, upsample [5,4,4,2,2]x320 @ 16 kHz
    (I_da hubert_lut.json, `model_in_dim`)

All convs are weight-normed; converted torch checkpoints match bit-for-bit
after weight-norm folding (tests/test_hifigan.py).
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.conv import avg_pool1d, get_padding
from .common import (LRELU_SLOPE, SNConv1d, WNConv1d, WNConv2d,
                     WNConvTranspose1d, leaky_relu)


@dataclasses.dataclass(frozen=True)
class HiFiGANConfig:
    resblock: str = "1"
    upsample_rates: Tuple[int, ...] = (8, 8, 2, 2)
    upsample_kernel_sizes: Tuple[int, ...] = (16, 16, 4, 4)
    upsample_initial_channel: int = 512
    resblock_kernel_sizes: Tuple[int, ...] = (3, 7, 11)
    resblock_dilation_sizes: Tuple[Tuple[int, ...], ...] = (
        (1, 3, 5), (1, 3, 5), (1, 3, 5))
    in_dim: int = 80          # 80 mels (I_ea) or model_in_dim=384 (I_da)
    sampling_rate: int = 22050
    dtype: jnp.dtype = jnp.float32

    @property
    def total_upsample(self) -> int:
        out = 1
        for u in self.upsample_rates:
            out *= u
        return out

    @staticmethod
    def from_dict(h: dict) -> "HiFiGANConfig":
        return HiFiGANConfig(
            resblock=str(h["resblock"]),
            upsample_rates=tuple(h["upsample_rates"]),
            upsample_kernel_sizes=tuple(h["upsample_kernel_sizes"]),
            upsample_initial_channel=h["upsample_initial_channel"],
            resblock_kernel_sizes=tuple(h["resblock_kernel_sizes"]),
            resblock_dilation_sizes=tuple(
                tuple(d) for d in h["resblock_dilation_sizes"]),
            in_dim=h.get("model_in_dim", h.get("num_mels", 80)) or 80,
            sampling_rate=h.get("sampling_rate", 22050),
        )


class ResBlock1(nn.Module):
    """MRF residual block: 3x [lrelu → dilated conv → lrelu → conv]."""
    channels: int
    kernel_size: int = 3
    dilation: Tuple[int, ...] = (1, 3, 5)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i, d in enumerate(self.dilation):
            xt = leaky_relu(x, LRELU_SLOPE)
            xt = WNConv1d(self.channels, self.kernel_size, dilation=d,
                          padding=get_padding(self.kernel_size, d),
                          kernel_init="hifigan", dtype=self.dtype,
                          name=f"convs1_{i}")(xt)
            xt = leaky_relu(xt, LRELU_SLOPE)
            xt = WNConv1d(self.channels, self.kernel_size, dilation=1,
                          padding=get_padding(self.kernel_size, 1),
                          kernel_init="hifigan", dtype=self.dtype,
                          name=f"convs2_{i}")(xt)
            x = xt + x
        return x


class ResBlock2(nn.Module):
    """Lighter MRF block (config V3): 2x [lrelu → dilated conv]."""
    channels: int
    kernel_size: int = 3
    dilation: Tuple[int, ...] = (1, 3)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i, d in enumerate(self.dilation):
            xt = leaky_relu(x, LRELU_SLOPE)
            xt = WNConv1d(self.channels, self.kernel_size, dilation=d,
                          padding=get_padding(self.kernel_size, d),
                          kernel_init="hifigan", dtype=self.dtype,
                          name=f"convs_{i}")(xt)
            x = xt + x
        return x


class Generator(nn.Module):
    """mel/feature (B, in_dim, T) → waveform (B, 1, T * prod(upsample_rates))."""
    cfg: HiFiGANConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        num_kernels = len(cfg.resblock_kernel_sizes)
        res_cls = ResBlock1 if cfg.resblock == "1" else ResBlock2
        x = WNConv1d(cfg.upsample_initial_channel, 7, padding=3,
                     dtype=cfg.dtype, name="conv_pre")(x)
        for i, (u, k) in enumerate(zip(cfg.upsample_rates,
                                       cfg.upsample_kernel_sizes)):
            ch = cfg.upsample_initial_channel // (2 ** (i + 1))
            x = leaky_relu(x, LRELU_SLOPE)
            x = WNConvTranspose1d(ch, k, stride=u, padding=(k - u) // 2,
                                  kernel_init="hifigan", dtype=cfg.dtype,
                                  name=f"ups_{i}")(x)
            xs = None
            for j, (rk, rd) in enumerate(zip(cfg.resblock_kernel_sizes,
                                             cfg.resblock_dilation_sizes)):
                out = res_cls(ch, rk, tuple(rd), dtype=cfg.dtype,
                              name=f"resblocks_{i}_{j}")(x)
                xs = out if xs is None else xs + out
            x = xs / num_kernels
        x = leaky_relu(x, 0.01)  # torch F.leaky_relu default slope here
        x = WNConv1d(1, 7, padding=3, kernel_init="hifigan", dtype=cfg.dtype,
                     name="conv_post")(x)
        return jnp.tanh(x)


class DiscriminatorP(nn.Module):
    """Period discriminator: fold 1D audio into (T/p, p) and run 2D convs.

    fold_periods=True is the TPU layout variant: the torch fold (B, C,
    T/p, p) puts the tiny period p on the 128-lane (minor) axis, wasting
    most of each HBM tile; instead the input is laid out (B, C, p, T/p)
    — the long conv axis on the lanes — and every conv applies the SAME
    parameters transposed (WNConv2d.transpose_hw). Outputs equal the
    default layout with the last two axes swapped; every loss consumed
    downstream (LSGAN means, feature-matching L1) is axis-order
    invariant, so training is unchanged. Param tree identical — the knob
    is checkpoint-compatible both ways.
    """
    period: int
    kernel_size: int = 5
    stride: int = 3
    dtype: jnp.dtype = jnp.float32
    fold_periods: bool = False

    @nn.compact
    def __call__(self, x):
        fmap = []
        b, c, t = x.shape
        p = self.period
        if t % p != 0:
            n_pad = p - (t % p)
            x = jnp.pad(x, ((0, 0), (0, 0), (0, n_pad)), mode="reflect")
            t = t + n_pad
        x = x.reshape(b, c, t // p, p)
        if self.fold_periods:
            x = jnp.swapaxes(x, 2, 3)                 # (B, C, p, T/p)
        tp = self.fold_periods
        chans = (32, 128, 512, 1024)
        for i, ch in enumerate(chans):
            x = WNConv2d(ch, (self.kernel_size, 1), stride=(self.stride, 1),
                         padding=(get_padding(5, 1), 0), dtype=self.dtype,
                         transpose_hw=tp, name=f"convs_{i}")(x)
            x = leaky_relu(x, LRELU_SLOPE)
            fmap.append(x)
        x = WNConv2d(1024, (self.kernel_size, 1), stride=(1, 1),
                     padding=(2, 0), dtype=self.dtype, transpose_hw=tp,
                     name="convs_4")(x)
        x = leaky_relu(x, LRELU_SLOPE)
        fmap.append(x)
        x = WNConv2d(1, (3, 1), stride=(1, 1), padding=(1, 0),
                     dtype=self.dtype, transpose_hw=tp, name="conv_post")(x)
        fmap.append(x)
        return x.reshape(b, -1), fmap


class MultiPeriodDiscriminator(nn.Module):
    periods: Tuple[int, ...] = (2, 3, 5, 7, 11)
    dtype: jnp.dtype = jnp.float32
    fold_periods: bool = False   # TPU layout knob — see DiscriminatorP

    @nn.compact
    def __call__(self, y, y_hat, batched: bool = False):
        """batched=True runs (real, fake) as ONE 2B forward per period —
        bit-identical outputs (weight-norm convs are per-sample), half the
        kernel launches at small shapes; the training-step speed knob
        (GANConfig.batched_disc). The reference applies each discriminator
        twice (I_ea/hifi_gan/models.py:141-151)."""
        y_d_rs, y_d_gs, fmap_rs, fmap_gs = [], [], [], []
        b = y.shape[0]
        x2 = jnp.concatenate([y, y_hat], axis=0) if batched else None
        for i, p in enumerate(self.periods):
            d = DiscriminatorP(p, dtype=self.dtype,
                               fold_periods=self.fold_periods,
                               name=f"discriminators_{i}")
            if batched:
                out, fmap = d(x2)
                y_d_r, y_d_g = out[:b], out[b:]
                fmap_r = [f[:b] for f in fmap]
                fmap_g = [f[b:] for f in fmap]
            else:
                y_d_r, fmap_r = d(y)
                y_d_g, fmap_g = d(y_hat)
            y_d_rs.append(y_d_r); fmap_rs.append(fmap_r)
            y_d_gs.append(y_d_g); fmap_gs.append(fmap_g)
        return y_d_rs, y_d_gs, fmap_rs, fmap_gs


class DiscriminatorS(nn.Module):
    """Scale discriminator (stack of grouped 1D convs)."""
    use_spectral_norm: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        fmap = []
        b = x.shape[0]
        specs = [  # (features, kernel, stride, groups, padding)
            (128, 15, 1, 1, 7),
            (128, 41, 2, 4, 20),
            (256, 41, 2, 16, 20),
            (512, 41, 4, 16, 20),
            (1024, 41, 4, 16, 20),
            (1024, 41, 1, 16, 20),
            (1024, 5, 1, 1, 2),
        ]
        for i, (f, k, s, g, pd) in enumerate(specs):
            if self.use_spectral_norm:
                x = SNConv1d(f, k, stride=s, groups=g, padding=pd,
                             dtype=self.dtype, name=f"convs_{i}")(
                                 x, update_stats=train)
            else:
                x = WNConv1d(f, k, stride=s, groups=g, padding=pd,
                             dtype=self.dtype, name=f"convs_{i}")(x)
            x = leaky_relu(x, LRELU_SLOPE)
            fmap.append(x)
        if self.use_spectral_norm:
            x = SNConv1d(1, 3, stride=1, padding=1, dtype=self.dtype,
                         name="conv_post")(x, update_stats=train)
        else:
            x = WNConv1d(1, 3, stride=1, padding=1, dtype=self.dtype,
                         name="conv_post")(x)
        fmap.append(x)
        return x.reshape(b, -1), fmap


class MultiScaleDiscriminator(nn.Module):
    dtype: jnp.dtype = jnp.float32
    scales: int = 3

    @nn.compact
    def __call__(self, y, y_hat, train: bool = True, batched: bool = False):
        """batched=True: weight-norm scales (1, 2) run (real, fake) as one
        2B forward — bit-identical, fewer launches. Scale 0 keeps its two
        sequential calls regardless: its spectral-norm power iteration
        advances once per forward in train mode (torch semantics,
        I_ea/hifi_gan/models.py:185-196), so real and fake legitimately see
        different u/v — batching it would change training numerics."""
        y_d_rs, y_d_gs, fmap_rs, fmap_gs = [], [], [], []
        b = y.shape[0]
        for i in range(self.scales):
            d = DiscriminatorS(use_spectral_norm=(i == 0), dtype=self.dtype,
                               name=f"discriminators_{i}")
            if i != 0:
                y = avg_pool1d(y, 4, 2, 2)
                y_hat = avg_pool1d(y_hat, 4, 2, 2)
            if batched and i != 0:
                out, fmap = d(jnp.concatenate([y, y_hat], axis=0), train)
                y_d_r, y_d_g = out[:b], out[b:]
                fmap_r = [f[:b] for f in fmap]
                fmap_g = [f[b:] for f in fmap]
            else:
                y_d_r, fmap_r = d(y, train)
                y_d_g, fmap_g = d(y_hat, train)
            y_d_rs.append(y_d_r); fmap_rs.append(fmap_r)
            y_d_gs.append(y_d_g); fmap_gs.append(fmap_g)
        return y_d_rs, y_d_gs, fmap_rs, fmap_gs
