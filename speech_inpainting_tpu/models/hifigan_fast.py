"""Inference-optimized HiFi-GAN generator engine.

The flax Generator re-folds weight norm every call (cheap but pointless at
inference) and leaves each MRF conv as a separate XLA op. This engine:
  1. folds weight norm ONCE into dense kernels — the `remove_weight_norm`
     inference fold (reference models.py:125-132);
  2. can run the small-channel late-stage residual conv pairs through the
     fused Pallas kernel (ops/pallas_resblock.py).

Measured on v5e: with double-buffered halo DMA the Pallas path wins the
f32 full-generator graph at C≤32 (B16×4s: flax 117.7 ms, fast-XLA 109.6,
fast+pallas 107.2) but loses at C=64 and in bf16 (B64: flax 199.7,
fast-XLA 191.4, fast+pallas 305.7 — Mosaic lacks bf16 predication, forcing
f32 upcasts). Since the serving configuration is bf16, the Pallas path is
OFF by default (`pallas_max_channels=0`); enable it for f32 deployments.

Numerically matches Generator.apply to float tolerance
(tests/test_pallas.py).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp

from ..ops.conv import (conv1d, conv_transpose1d, get_padding,
                        weight_norm_kernel)
from ..ops.pallas_resblock import fused_resblock_step
from .hifigan import HiFiGANConfig

LRELU_SLOPE = 0.1


def _fold(p: Dict) -> Dict:
    return {"w": weight_norm_kernel(p["v"], p["g"]), "b": p.get("b")}


@dataclasses.dataclass
class FastGenerator:
    """Folded-weight generator; `pallas_max_channels` gates the fused path
    (0 disables it, e.g. for CPU tests without interpret mode)."""
    cfg: HiFiGANConfig
    folded: Dict[str, Any]
    pallas_max_channels: int = 0
    interpret: bool = False

    @staticmethod
    def from_params(cfg: HiFiGANConfig, params: Dict,
                    pallas_max_channels: int = 0,
                    interpret: bool = False) -> "FastGenerator":
        folded = {"conv_pre": _fold(params["conv_pre"]),
                  "conv_post": _fold(params["conv_post"])}
        for i in range(len(cfg.upsample_rates)):
            folded[f"ups_{i}"] = _fold(params[f"ups_{i}"])
            for j in range(len(cfg.resblock_kernel_sizes)):
                blk = params[f"resblocks_{i}_{j}"]
                fb = {}
                for name, p in blk.items():
                    fb[name] = _fold(p)
                folded[f"resblocks_{i}_{j}"] = fb
        return FastGenerator(cfg, folded, pallas_max_channels, interpret)

    def _resblock1(self, x, blk, kernel_size: int, dilations):
        c = x.shape[1]
        use_pallas = (c <= self.pallas_max_channels and c % 8 == 0)
        for i, d in enumerate(dilations):
            p1, p2 = blk[f"convs1_{i}"], blk[f"convs2_{i}"]
            if use_pallas:
                x = fused_resblock_step(x, p1["w"], p1["b"], p2["w"],
                                        p2["b"], dilation=int(d),
                                        interpret=self.interpret)
            else:
                xt = jax.nn.leaky_relu(x, LRELU_SLOPE)
                xt = conv1d(xt, p1["w"], p1["b"], dilation=int(d),
                            padding=get_padding(kernel_size, int(d)))
                xt = jax.nn.leaky_relu(xt, LRELU_SLOPE)
                xt = conv1d(xt, p2["w"], p2["b"], dilation=1,
                            padding=get_padding(kernel_size, 1))
                x = x + xt
        return x

    def _resblock2(self, x, blk, kernel_size: int, dilations):
        for i, d in enumerate(dilations):
            p = blk[f"convs_{i}"]
            xt = jax.nn.leaky_relu(x, LRELU_SLOPE)
            xt = conv1d(xt, p["w"], p["b"], dilation=int(d),
                        padding=get_padding(kernel_size, int(d)))
            x = x + xt
        return x

    def __call__(self, mel):
        """mel/features (B, in_dim, T) → waveform (B, 1, T·∏upsample)."""
        cfg = self.cfg
        f = self.folded
        num_kernels = len(cfg.resblock_kernel_sizes)
        x = conv1d(mel, f["conv_pre"]["w"], f["conv_pre"]["b"], padding=3)
        for i, (u, k) in enumerate(zip(cfg.upsample_rates,
                                       cfg.upsample_kernel_sizes)):
            x = jax.nn.leaky_relu(x, LRELU_SLOPE)
            up = f[f"ups_{i}"]
            x = conv_transpose1d(x, up["w"], up["b"], stride=u,
                                 padding=(k - u) // 2)
            xs = None
            for j, (rk, rd) in enumerate(zip(cfg.resblock_kernel_sizes,
                                             cfg.resblock_dilation_sizes)):
                blk = f[f"resblocks_{i}_{j}"]
                if cfg.resblock == "1":
                    out = self._resblock1(x, blk, rk, rd)
                else:
                    out = self._resblock2(x, blk, rk, rd)
                xs = out if xs is None else xs + out
            x = xs / num_kernels
        x = jax.nn.leaky_relu(x, 0.01)
        x = conv1d(x, f["conv_post"]["w"], f["conv_post"]["b"], padding=3)
        return jnp.tanh(x)
