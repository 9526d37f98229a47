"""Inference-optimized HiFi-GAN generator engine.

The flax Generator re-folds weight norm every call (cheap but pointless at
inference) and leaves each MRF conv as a separate XLA op. This engine:
  1. folds weight norm ONCE into dense kernels — the `remove_weight_norm`
     inference fold (reference models.py:125-132);
  2. can run the small-channel late-stage residual conv pairs through the
     fused Pallas kernel (ops/pallas_resblock.py).

Measured on v5e (round 2, whole-block im2col kernel `fused_resblock1`):
ISOLATED the Pallas path now wins in bf16 too — per-block 1.2-2.6× vs
the XLA chain at C≤64, B16-64 (table in ops/pallas_resblock.py) — but
COMPOSED into the full flagship inpainting graph it loses at serving
batches (B256: flax 734 ms vs pallas64 1029-1059; B64: 360 vs 388-405):
XLA fuses the resblock chain with the surrounding upsample convs and
re-lays-out across block boundaries, which the custom-call boundary
forbids. Default therefore stays OFF (`pallas_max_channels=0`) — a
data-closed negative result for in-graph serving; the kernel remains the
right primitive for standalone/small-graph resblock workloads.

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
from ..ops.pallas_resblock import fused_resblock1
from .hifigan import HiFiGANConfig

LRELU_SLOPE = 0.1


def _fold(p: Dict) -> Dict:
    return {"w": weight_norm_kernel(p["v"], p["g"]), "b": p.get("b")}


@dataclasses.dataclass
class FastGenerator:
    """Folded-weight generator; `pallas_max_channels` gates the fused path
    (0 disables it, e.g. for CPU tests without interpret mode).
    `pallas_skip` removes specific (channels, kernel_size) blocks where the
    measured per-shape numbers favor XLA even under the channel cap."""
    cfg: HiFiGANConfig
    folded: Dict[str, Any]
    pallas_max_channels: int = 0
    interpret: bool = False
    pallas_tile: int = 2048
    pallas_skip: frozenset = frozenset()

    @staticmethod
    def from_params(cfg: HiFiGANConfig, params: Dict,
                    pallas_max_channels: int = 0,
                    interpret: bool = False,
                    pallas_tile: int = 2048,
                    pallas_skip: frozenset = frozenset()
                    ) -> "FastGenerator":
        folded = {"conv_pre": _fold(params["conv_pre"]),
                  "conv_post": _fold(params["conv_post"])}
        for i in range(len(cfg.upsample_rates)):
            folded[f"ups_{i}"] = _fold(params[f"ups_{i}"])
            for j in range(len(cfg.resblock_kernel_sizes)):
                blk = params[f"resblocks_{i}_{j}"]
                fb = {name: _fold(p) for name, p in blk.items()}
                if cfg.resblock == "1":
                    # stack the block's conv pairs (S, C, C, K) so the
                    # whole-block Pallas kernel gets them in one shot
                    s = len(cfg.resblock_dilation_sizes[j])
                    fb = {
                        "w1": jnp.stack(
                            [fb[f"convs1_{i_}"]["w"] for i_ in range(s)]),
                        "b1": jnp.stack(
                            [fb[f"convs1_{i_}"]["b"] for i_ in range(s)]),
                        "w2": jnp.stack(
                            [fb[f"convs2_{i_}"]["w"] for i_ in range(s)]),
                        "b2": jnp.stack(
                            [fb[f"convs2_{i_}"]["b"] for i_ in range(s)]),
                    }
                folded[f"resblocks_{i}_{j}"] = fb
        if cfg.dtype != jnp.float32:
            # match the flax module's dtype semantics (params + activations
            # cast to cfg.dtype at apply time; hifigan.py:40)
            folded = jax.tree_util.tree_map(
                lambda a: a.astype(cfg.dtype), folded)
        return FastGenerator(cfg, folded, pallas_max_channels, interpret,
                             pallas_tile, pallas_skip)

    def _resblock1(self, x, blk, kernel_size: int, dilations):
        c = x.shape[1]
        if (c <= self.pallas_max_channels and c % 8 == 0
                and (c, kernel_size) not in self.pallas_skip):
            return fused_resblock1(
                x, blk["w1"], blk["b1"], blk["w2"], blk["b2"],
                dilations=tuple(int(d) for d in dilations),
                tile=self.pallas_tile, interpret=self.interpret)
        for i, d in enumerate(dilations):
            w1, b1 = blk["w1"][i], blk["b1"][i]
            w2, b2 = blk["w2"][i], blk["b2"][i]
            xt = jax.nn.leaky_relu(x, LRELU_SLOPE)
            xt = conv1d(xt, w1, b1, dilation=int(d),
                        padding=get_padding(kernel_size, int(d)))
            xt = jax.nn.leaky_relu(xt, LRELU_SLOPE)
            xt = conv1d(xt, w2, b2, dilation=1,
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
        return self.apply(self.folded, mel)

    def apply(self, folded, mel):
        """Pure forward over an explicit folded-param tree — lets callers
        jit with the params as ARGUMENTS (required on remote-compile
        backends, see infer/inpaint.py module docstring) instead of baked
        closure constants."""
        cfg = self.cfg
        f = folded
        num_kernels = len(cfg.resblock_kernel_sizes)
        x = conv1d(mel.astype(cfg.dtype), f["conv_pre"]["w"],
                   f["conv_pre"]["b"], padding=3)
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
