"""Dynamic int8 (W8A8) matmul path for serving — TPU MXU-native.

The reference has no quantized inference (pure f32 torch,
I_ea/predict.py:145-163); this is a beyond-parity serving option. The v5e MXU
executes int8xint8->int32 dots at 2x its bf16 rate, but COMPOSED the win is
much smaller: on a 24-dense chain at serving shapes (8192 rows x 768x768,
loop-count-differenced on this chip to cancel the tunnel's readback floor)
bf16 runs at MXU peak (47 us/dense) and W8A8 lands at 1.12x (dynamic) /
1.16x (weights pre-quantized) — the per-layer activation quantize/rescale
elementwise passes cost nearly what the 2x rate saves at d=768. End-to-end
the HuBERT transformer is a ~10 ms slice of the B256 serving graph, so
serving DEFAULTS STAY bf16; this path is an opt-in (`HubertConfig.int8`) that
pays only at larger hidden sizes or once the quantize ops are fused into the
dot prologue. Measured accuracy envelope at base scale on real speech:
rel 2.4e-2 vs torch-f32 (the TPU's default bf16-pass f32 sits at 8.3e-3).

Scheme: symmetric dynamic quantization, chosen so every scale factors OUT of
the contraction and the rescale is exact:

    x: (..., K) activations  -> per-ROW scale   sx = amax(|x|, -1)/127
    w: (K, N)  weights       -> per-COLUMN scale sw = amax(|w|, 0)/127
    y = (round(x/sx) . round(w/sw)) * sx * sw      [int8 MXU dot -> int32]

Per-token activation scales (not per-tensor) keep quiet frames from being
crushed by loud ones; per-output-channel weight scales are exact for free.
Weights are quantized on the fly inside the jit: params stay f32 (converted
checkpoints work unchanged, and params must remain jit ARGUMENTS — see the
HTTP-413 rule in CLAUDE.md), and the O(K.N) quantize is noise next to the
O(rows.K.N) dot it accelerates.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


def quantize_rows(x, eps: float = 1e-8):
    """Symmetric per-row int8 quantization over the last axis.

    Returns (q, scale): q int8 with |q| <= 127, scale f32 broadcastable so
    that q * scale ~= x. All-zero rows get scale eps/127 (q = 0).
    """
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, eps) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8), scale


def quantize_cols(w, eps: float = 1e-8):
    """Symmetric per-column int8 quantization of a (K, N) weight matrix."""
    amax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=0, keepdims=True)
    scale = jnp.maximum(amax, eps) / 127.0
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8), scale


def dynamic_int8_dot(x, w, out_dtype=jnp.float32):
    """x (..., K) @ w (K, N) via the int8 MXU with exact f32 rescale."""
    xq, sx = quantize_rows(x)
    wq, sw = quantize_cols(w)
    y = jax.lax.dot_general(
        xq.reshape(-1, xq.shape[-1]), wq,
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * sx.reshape(-1, 1) * sw
    return y.reshape(*x.shape[:-1], w.shape[-1]).astype(out_dtype)


class Int8Dense(nn.Module):
    """Drop-in for `nn.Dense` running its dot on the int8 MXU path.

    Parameter structure/names ('kernel' (K, N), 'bias' (N,)) are identical to
    `nn.Dense`, so f32 params — including converted torch checkpoints — slot
    in unchanged; quantization happens per forward on device.
    """
    features: int
    dtype: jnp.dtype = jnp.float32
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (x.shape[-1], self.features), jnp.float32)
        y = dynamic_int8_dot(x, kernel, out_dtype=self.dtype)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), jnp.float32)
            y = y + bias.astype(self.dtype)
        return y


__all__ = ["quantize_rows", "quantize_cols", "dynamic_int8_dot", "Int8Dense"]
