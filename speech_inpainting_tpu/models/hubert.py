"""HuBERT SSL encoder (flax), TPU-first.

Re-implementation of the HuBERT architecture consumed by the reference through
HF `transformers.HubertModel` (I_ea/model.py:21-89) and fairseq
(I_da/src/hubert_feature_reader.py): 7-layer strided conv feature extractor
(total stride 320, receptive field 400 @16 kHz), feature projection, conv
positional embedding, and a 12/24-layer transformer in post-LN ("base") or
pre-LN/stable ("large") arrangement. The I_ea head (LayerNorm + Linear →
codebook_dim) from I_ea/model.py:69-78 is `PredictionHead`.

TPU notes: attention and MLPs run in `cfg.dtype` (bf16 capable) with fp32
params; sequence lengths are static per jit specialization — batch across
utterances with bucketed padding + attention masks instead of dynamic shapes.
`tap_layer` supports I_da's intermediate-layer feature extraction
(hubert_feature_reader.py:60-65).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.conv import conv1d


@dataclasses.dataclass(frozen=True)
class HubertConfig:
    conv_dim: Tuple[int, ...] = (512,) * 7
    conv_stride: Tuple[int, ...] = (5, 2, 2, 2, 2, 2, 2)
    conv_kernel: Tuple[int, ...] = (10, 3, 3, 3, 3, 2, 2)
    conv_bias: bool = False
    feat_extract_norm: str = "group"      # "group" (base) | "layer" (large)
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    do_stable_layer_norm: bool = False
    num_conv_pos_embeddings: int = 128
    num_conv_pos_embedding_groups: int = 16
    layer_norm_eps: float = 1e-5
    feat_proj_layer_norm: bool = True
    dtype: jnp.dtype = jnp.float32
    # serving-only: run the transformer projections (q/k/v/o, MLP) on the
    # int8 MXU path (ops/int8.py W8A8 dynamic quantization). Params stay f32
    # — enable on an existing config with dataclasses.replace(cfg, int8=True).
    int8: bool = False

    @staticmethod
    def base(**over) -> "HubertConfig":
        return HubertConfig(**over)

    @staticmethod
    def large(**over) -> "HubertConfig":
        d = dict(conv_bias=True, feat_extract_norm="layer", hidden_size=1024,
                 num_hidden_layers=24, num_attention_heads=16,
                 intermediate_size=4096, do_stable_layer_norm=True)
        d.update(over)
        return HubertConfig(**d)

    @staticmethod
    def from_hf(hf_config) -> "HubertConfig":
        c = hf_config
        return HubertConfig(
            conv_dim=tuple(c.conv_dim), conv_stride=tuple(c.conv_stride),
            conv_kernel=tuple(c.conv_kernel), conv_bias=c.conv_bias,
            feat_extract_norm=c.feat_extract_norm, hidden_size=c.hidden_size,
            num_hidden_layers=c.num_hidden_layers,
            num_attention_heads=c.num_attention_heads,
            intermediate_size=c.intermediate_size,
            do_stable_layer_norm=c.do_stable_layer_norm,
            num_conv_pos_embeddings=c.num_conv_pos_embeddings,
            num_conv_pos_embedding_groups=c.num_conv_pos_embedding_groups,
            layer_norm_eps=c.layer_norm_eps,
            feat_proj_layer_norm=getattr(c, "feat_proj_layer_norm", True))

    def feature_lengths(self, sample_lengths):
        """Conv-stack output lengths for given waveform lengths (HF formula)."""
        l = sample_lengths
        for k, s in zip(self.conv_kernel, self.conv_stride):
            l = (l - k) // s + 1
        return l

    @property
    def total_stride(self) -> int:
        out = 1
        for s in self.conv_stride:
            out *= s
        return out


class FeatureEncoder(nn.Module):
    """Strided conv stack over raw waveform: (B, T) -> (B, frames, C)."""
    cfg: HubertConfig

    @nn.compact
    def __call__(self, wav):
        cfg = self.cfg
        x = wav[:, None, :].astype(cfg.dtype)  # (B, 1, T)
        for i, (c, k, s) in enumerate(zip(cfg.conv_dim, cfg.conv_kernel,
                                          cfg.conv_stride)):
            w = self.param(f"conv_{i}_w", nn.initializers.he_normal(),
                           (c, x.shape[1], k))
            b = (self.param(f"conv_{i}_b", nn.initializers.zeros, (c,))
                 if cfg.conv_bias else None)
            x = conv1d(x, w.astype(cfg.dtype),
                       None if b is None else b.astype(cfg.dtype), stride=s)
            if cfg.feat_extract_norm == "group" and i == 0:
                # torch GroupNorm(C, C): per-channel mean/var over time
                xt = jnp.swapaxes(x, 1, 2).astype(jnp.float32)  # (B, T, C)
                xt = nn.GroupNorm(num_groups=None, group_size=1,
                                  epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
                                  name=f"norm_{i}")(xt)
                x = jnp.swapaxes(xt, 1, 2).astype(cfg.dtype)
            elif cfg.feat_extract_norm == "layer":
                xt = jnp.swapaxes(x, 1, 2).astype(jnp.float32)
                xt = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
                                  name=f"norm_{i}")(xt)
                x = jnp.swapaxes(xt, 1, 2).astype(cfg.dtype)
            x = jax.nn.gelu(x, approximate=False)
        return jnp.swapaxes(x, 1, 2)  # (B, frames, C)


class PositionalConvEmbedding(nn.Module):
    """Grouped conv relative positional embedding (weight-normed, dim=2)."""
    cfg: HubertConfig

    @nn.compact
    def __call__(self, x):  # (B, T, H)
        cfg = self.cfg
        h = cfg.hidden_size
        k = cfg.num_conv_pos_embeddings
        g = cfg.num_conv_pos_embedding_groups
        v = self.param("conv_v", nn.initializers.he_normal(), (h, h // g, k))
        # torch weight_norm(dim=2): one magnitude per kernel position
        gg = self.param("conv_g",
                        lambda key, shape: jnp.sqrt(
                            jnp.sum(jnp.square(v), axis=(0, 1))),
                        (k,))
        norm = jnp.sqrt(jnp.sum(jnp.square(v), axis=(0, 1), keepdims=True))
        w = (gg[None, None, :] * v / norm).astype(cfg.dtype)
        b = self.param("conv_b", nn.initializers.zeros, (h,))
        xt = jnp.swapaxes(x, 1, 2)  # (B, H, T)
        out = conv1d(xt, w, b.astype(cfg.dtype), padding=k // 2, groups=g)
        if k % 2 == 0:  # SamePadLayer: drop trailing element
            out = out[:, :, :-1]
        out = jax.nn.gelu(out, approximate=False)
        return jnp.swapaxes(out, 1, 2)


def _dense(cfg: HubertConfig, features: int, name: str):
    """nn.Dense, or its int8-MXU drop-in when cfg.int8 (identical params)."""
    if cfg.int8:
        from ..ops.int8 import Int8Dense
        return Int8Dense(features, dtype=cfg.dtype, name=name)
    return nn.Dense(features, dtype=cfg.dtype, param_dtype=jnp.float32,
                    name=name)


class SelfAttention(nn.Module):
    cfg: HubertConfig

    @nn.compact
    def __call__(self, x, attn_bias=None):
        cfg = self.cfg
        h, nh = cfg.hidden_size, cfg.num_attention_heads
        hd = h // nh
        dense = lambda name: _dense(cfg, h, name)
        q = dense("q_proj")(x) * (hd ** -0.5)
        k = dense("k_proj")(x)
        v = dense("v_proj")(x)
        B, T, _ = x.shape
        q = q.reshape(B, T, nh, hd)
        k = k.reshape(B, T, nh, hd)
        v = v.reshape(B, T, nh, hd)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k)
        if attn_bias is not None:
            scores = scores + attn_bias
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(cfg.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(B, T, h)
        return dense("out_proj")(out)


class FeedForward(nn.Module):
    cfg: HubertConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        x = _dense(cfg, cfg.intermediate_size, "intermediate_dense")(x)
        x = jax.nn.gelu(x, approximate=False)
        return _dense(cfg, cfg.hidden_size, "output_dense")(x)


class EncoderLayer(nn.Module):
    cfg: HubertConfig

    @nn.compact
    def __call__(self, x, attn_bias=None):
        cfg = self.cfg
        ln = lambda name: nn.LayerNorm(epsilon=cfg.layer_norm_eps,
                                       dtype=jnp.float32, name=name)
        if cfg.do_stable_layer_norm:  # pre-LN (large)
            x = x + SelfAttention(cfg, name="attention")(ln("layer_norm")(x),
                                                         attn_bias)
            x = x + FeedForward(cfg, name="feed_forward")(
                ln("final_layer_norm")(x))
        else:  # post-LN (base)
            x = ln("layer_norm")(x + SelfAttention(cfg, name="attention")(
                x, attn_bias))
            x = ln("final_layer_norm")(x + FeedForward(cfg, name="feed_forward")(x))
        return x


class HubertModel(nn.Module):
    """Waveform (B, T) [+ sample-level attention mask] → frame embeddings.

    `tap_layer`: return hidden states *entering* transformer layer N (the
    fairseq `output_layer=N` convention: output after N layers). None → final
    output (with the stable-LN final LayerNorm for 'large').
    """
    cfg: HubertConfig

    @nn.compact
    def __call__(self, wav, attention_mask=None, tap_layer: Optional[int] = None):
        cfg = self.cfg
        feats = FeatureEncoder(cfg, name="feature_extractor")(wav)
        B, T, _ = feats.shape

        x = feats.astype(jnp.float32)
        if cfg.feat_proj_layer_norm:
            x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
                             name="fp_layer_norm")(x)
        x = nn.Dense(cfg.hidden_size, dtype=cfg.dtype, param_dtype=jnp.float32,
                     name="fp_projection")(x)

        attn_bias = None
        if attention_mask is not None:
            lengths = cfg.feature_lengths(jnp.sum(attention_mask, axis=-1))
            fmask = jnp.arange(T)[None, :] < lengths[:, None]  # (B, T)
            x = jnp.where(fmask[:, :, None], x, 0.0)
            attn_bias = jnp.where(fmask[:, None, None, :], 0.0,
                                  jnp.finfo(jnp.float32).min)

        x = x + PositionalConvEmbedding(cfg, name="pos_conv_embed")(x)
        if not cfg.do_stable_layer_norm:
            x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
                             name="encoder_layer_norm")(x.astype(jnp.float32))

        n = cfg.num_hidden_layers if tap_layer is None else tap_layer
        for i in range(n):
            x = EncoderLayer(cfg, name=f"layers_{i}")(x, attn_bias)

        if tap_layer is None and cfg.do_stable_layer_norm:
            x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
                             name="encoder_layer_norm")(x.astype(jnp.float32))
        return x


def extract_features_chunked(model: "HubertModel", params, wav,
                             *, tap_layer: Optional[int] = None,
                             chunk: int = 1_600_000):
    """Frame features for arbitrarily long audio by processing `chunk`-sample
    pieces independently and concatenating — the reference feature reader's
    long-audio strategy (I_da/src/hubert_feature_reader.py:13,57-67, 100 s
    chunks; boundary effects at chunk joins are accepted there too).

    wav: (T,) numpy/jax array → (frames, hidden) array.
    """
    wav = np.asarray(wav, np.float32)
    outs = []
    for start in range(0, len(wav), chunk):
        piece = wav[start:start + chunk]
        if int(model.cfg.feature_lengths(np.array([len(piece)]))[0]) < 1:
            break
        feats = model.apply({"params": params},
                            jnp.asarray(piece)[None], tap_layer=tap_layer)
        outs.append(np.asarray(feats[0]))
    return np.concatenate(outs, axis=0) if outs else np.zeros(
        (0, model.cfg.hidden_size), np.float32)


class PredictionHead(nn.Module):
    """I_ea CustomModel head: LayerNorm + Linear → codebook_dim (or n_classes)."""
    out_dim: int
    layer_norm_eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        x = nn.LayerNorm(epsilon=self.layer_norm_eps, dtype=jnp.float32,
                         name="layer_norm")(x.astype(jnp.float32))
        return nn.Dense(self.out_dim, param_dtype=jnp.float32, name="linear")(x)


class EncoderWithHead(nn.Module):
    """I_ea CustomModel: HuBERT encoder + LayerNorm/Linear head."""
    cfg: HubertConfig
    out_dim: int = 80

    @nn.compact
    def __call__(self, wav, attention_mask=None):
        x = HubertModel(self.cfg, name="hubert")(wav, attention_mask)
        return PredictionHead(self.out_dim, self.cfg.layer_norm_eps,
                              name="head")(x)
