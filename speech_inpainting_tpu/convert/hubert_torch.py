"""Convert HuBERT checkpoints (HF transformers / fairseq / I_ea CustomModel)
into flax variable trees for `models.hubert.HubertModel`.

Handled external formats (SURVEY.md §5.4 checkpoint inventory):
  - HF `transformers.HubertModel` state dicts — the I_ea encoder base
    (reference I_ea/model.py:21-47 loads facebook/hubert-{base,large}-ls960*).
  - I_ea `CustomModel` fine-tuned state dicts: HF keys under `base_model.` plus
    the LayerNorm+Linear head `final_layers.{0,1}` (I_ea/model.py:69-78).
  - fairseq HubertModel state dicts (`ckpt['model']`) — the frozen feature
    extractor of I_da (I_da/src/hubert_feature_reader.py:16-24).

Dense kernels are transposed torch(out,in) → flax(in,out); conv kernels keep
the torch (O, I, K) layout our `ops.conv` uses directly.
"""
from __future__ import annotations

import numpy as np

from ..models.hubert import HubertConfig


def _np(t):
    # copy: .numpy() would alias torch storage, which later in-place
    # optimizer updates on the source module would silently mutate
    if hasattr(t, "detach"):
        return t.detach().cpu().numpy().copy()
    return np.array(t)


def _ln(sd, prefix):
    return {"scale": _np(sd[f"{prefix}.weight"]), "bias": _np(sd[f"{prefix}.bias"])}


def _dense(sd, prefix):
    return {"kernel": _np(sd[f"{prefix}.weight"]).T,
            "bias": _np(sd[f"{prefix}.bias"])}


def _pos_conv(sd, prefix):
    """weight-norm(dim=2) grouped conv → (conv_v, conv_g, conv_b)."""
    if f"{prefix}.weight_g" in sd:
        g = _np(sd[f"{prefix}.weight_g"])
        v = _np(sd[f"{prefix}.weight_v"])
    elif f"{prefix}.parametrizations.weight.original0" in sd:
        g = _np(sd[f"{prefix}.parametrizations.weight.original0"])
        v = _np(sd[f"{prefix}.parametrizations.weight.original1"])
    else:
        raise KeyError(f"no weight-norm params under '{prefix}'")
    return {"conv_v": v, "conv_g": g.reshape(-1), "conv_b": _np(sd[f"{prefix}.bias"])}


def convert_hf_hubert(sd: dict, cfg: HubertConfig) -> dict:
    """HF transformers HubertModel state_dict → flax params."""
    fe = {}
    for i in range(len(cfg.conv_dim)):
        fe[f"conv_{i}_w"] = _np(sd[f"feature_extractor.conv_layers.{i}.conv.weight"])
        if cfg.conv_bias:
            fe[f"conv_{i}_b"] = _np(sd[f"feature_extractor.conv_layers.{i}.conv.bias"])
        lnk = f"feature_extractor.conv_layers.{i}.layer_norm.weight"
        if lnk in sd:  # GroupNorm at i==0 (base) or per-layer LN (large)
            fe[f"norm_{i}"] = _ln(sd, f"feature_extractor.conv_layers.{i}.layer_norm")
    params = {"feature_extractor": fe}
    if cfg.feat_proj_layer_norm:
        params["fp_layer_norm"] = _ln(sd, "feature_projection.layer_norm")
    params["fp_projection"] = _dense(sd, "feature_projection.projection")
    params["pos_conv_embed"] = _pos_conv(sd, "encoder.pos_conv_embed.conv")
    params["encoder_layer_norm"] = _ln(sd, "encoder.layer_norm")
    for i in range(cfg.num_hidden_layers):
        p = f"encoder.layers.{i}"
        params[f"layers_{i}"] = {
            "attention": {n: _dense(sd, f"{p}.attention.{n}")
                          for n in ("q_proj", "k_proj", "v_proj", "out_proj")},
            "layer_norm": _ln(sd, f"{p}.layer_norm"),
            "final_layer_norm": _ln(sd, f"{p}.final_layer_norm"),
            "feed_forward": {
                "intermediate_dense": _dense(sd, f"{p}.feed_forward.intermediate_dense"),
                "output_dense": _dense(sd, f"{p}.feed_forward.output_dense"),
            },
        }
    return params


def convert_custom_model(sd: dict, cfg: HubertConfig) -> dict:
    """I_ea CustomModel state_dict (base_model.* + final_layers.*) →
    flax params for `models.hubert.EncoderWithHead`."""
    base = {k[len("base_model."):]: v for k, v in sd.items()
            if k.startswith("base_model.")}
    return {
        "hubert": convert_hf_hubert(base, cfg),
        "head": {"layer_norm": _ln(sd, "final_layers.0"),
                 "linear": _dense(sd, "final_layers.1")},
    }


def convert_fairseq_hubert(sd: dict, cfg: HubertConfig) -> dict:
    """fairseq HubertModel state_dict (ckpt['model']) → flax params.

    fairseq naming: feature_extractor.conv_layers.{i}.0 (conv) / .2 (norm,
    group at i=0) or .2.1 ("layer" mode LN after a TransposeLast pair),
    post_extract_proj, layer_norm (pre-proj LN), encoder.pos_conv.0,
    encoder.layers.{i}.self_attn.{q,k,v,out}_proj / self_attn_layer_norm /
    fc1 / fc2 / final_layer_norm, encoder.layer_norm.
    """
    fe = {}
    for i in range(len(cfg.conv_dim)):
        base = f"feature_extractor.conv_layers.{i}"
        fe[f"conv_{i}_w"] = _np(sd[f"{base}.0.weight"])
        if cfg.conv_bias and f"{base}.0.bias" in sd:
            fe[f"conv_{i}_b"] = _np(sd[f"{base}.0.bias"])
        for norm_key in (f"{base}.2", f"{base}.2.1"):
            if f"{norm_key}.weight" in sd:
                fe[f"norm_{i}"] = _ln(sd, norm_key)
                break
    params = {"feature_extractor": fe}
    if cfg.feat_proj_layer_norm:
        params["fp_layer_norm"] = _ln(sd, "layer_norm")
    params["fp_projection"] = _dense(sd, "post_extract_proj")
    params["pos_conv_embed"] = _pos_conv(sd, "encoder.pos_conv.0")
    params["encoder_layer_norm"] = _ln(sd, "encoder.layer_norm")
    for i in range(cfg.num_hidden_layers):
        p = f"encoder.layers.{i}"
        params[f"layers_{i}"] = {
            "attention": {n: _dense(sd, f"{p}.self_attn.{n}")
                          for n in ("q_proj", "k_proj", "v_proj", "out_proj")},
            "layer_norm": _ln(sd, f"{p}.self_attn_layer_norm"),
            "final_layer_norm": _ln(sd, f"{p}.final_layer_norm"),
            "feed_forward": {
                "intermediate_dense": _dense(sd, f"{p}.fc1"),
                "output_dense": _dense(sd, f"{p}.fc2"),
            },
        }
    return params


def load_hf_pretrained(name_or_path: str):
    """Load an HF HuBERT checkpoint → (HubertConfig, flax params)."""
    from transformers import HubertModel as HFHubert
    m = HFHubert.from_pretrained(name_or_path)
    cfg = HubertConfig.from_hf(m.config)
    return cfg, convert_hf_hubert(m.state_dict(), cfg)
