"""Parity tests: flax HuBERT vs HF transformers' torch HubertModel.

A random tiny HF HubertModel is converted with
`speech_inpainting_tpu.convert.hubert_torch` and must match on raw waveforms,
with and without attention masks, in base (post-LN/group-norm) and large
(stable-LN/layer-norm) arrangements. This validates the conv frontend, conv
positional embedding (weight-norm dim=2), transformer, masking semantics, and
the converter at once.
"""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from speech_inpainting_tpu.models.hubert import (
    EncoderWithHead, HubertConfig, HubertModel)
from speech_inpainting_tpu.convert.hubert_torch import (
    convert_custom_model, convert_hf_hubert)

from transformers import HubertConfig as HFConfig
from transformers import HubertModel as HFHubert

TINY_BASE = dict(conv_dim=[8, 8, 8], conv_stride=[5, 2, 2], conv_kernel=[10, 3, 3],
                 conv_bias=False, feat_extract_norm="group", hidden_size=16,
                 num_hidden_layers=2, num_attention_heads=2,
                 intermediate_size=24, num_conv_pos_embeddings=15,
                 num_conv_pos_embedding_groups=1, do_stable_layer_norm=False)
TINY_LARGE = dict(TINY_BASE, conv_bias=True, feat_extract_norm="layer",
                  do_stable_layer_norm=True)


def make_pair(kind: dict, seed: int = 0):
    torch.manual_seed(seed)
    hf_cfg = HFConfig(**kind)
    tm = HFHubert(hf_cfg).eval()
    cfg = HubertConfig.from_hf(hf_cfg)
    params = convert_hf_hubert(tm.state_dict(), cfg)
    return tm, cfg, params


@pytest.mark.parametrize("kind", [TINY_BASE, TINY_LARGE],
                         ids=["base", "large"])
def test_hubert_parity(kind, rng):
    tm, cfg, params = make_pair(kind)
    wav = rng.standard_normal((2, 2000)).astype(np.float32) * 0.1
    with torch.no_grad():
        want = tm(torch.from_numpy(wav)).last_hidden_state.numpy()
    got = np.asarray(HubertModel(cfg).apply({"params": params},
                                            jnp.asarray(wav)))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


def test_hubert_parity_with_attention_mask(rng):
    tm, cfg, params = make_pair(TINY_BASE)
    wav = rng.standard_normal((2, 2000)).astype(np.float32) * 0.1
    mask = np.ones((2, 2000), dtype=np.int64)
    mask[1, 1200:] = 0
    wav[1, 1200:] = 0.0
    with torch.no_grad():
        want = tm(torch.from_numpy(wav),
                  attention_mask=torch.from_numpy(mask)).last_hidden_state.numpy()
    got = np.asarray(HubertModel(cfg).apply(
        {"params": params}, jnp.asarray(wav), jnp.asarray(mask)))
    valid = int(cfg.feature_lengths(np.array([1200]))[0])
    # compare valid frames for the short item, all frames for the full one
    np.testing.assert_allclose(got[0], want[0], atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(got[1, :valid], want[1, :valid],
                               atol=2e-4, rtol=1e-3)


def test_custom_model_head_parity(rng):
    """I_ea CustomModel = HuBERT + LayerNorm/Linear head (I_ea/model.py:69-88)."""
    tm, cfg, _ = make_pair(TINY_BASE)
    torch.manual_seed(1)
    head = torch.nn.Sequential(torch.nn.LayerNorm(16), torch.nn.Linear(16, 5))
    sd = {f"base_model.{k}": v for k, v in tm.state_dict().items()}
    sd.update({f"final_layers.{k}": v for k, v in head.state_dict().items()})
    params = convert_custom_model(sd, cfg)

    wav = rng.standard_normal((1, 1600)).astype(np.float32) * 0.1
    with torch.no_grad():
        want = head(tm(torch.from_numpy(wav)).last_hidden_state).numpy()
    got = np.asarray(EncoderWithHead(cfg, out_dim=5).apply(
        {"params": params}, jnp.asarray(wav)))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


def test_feature_lengths_match_hf():
    hf_cfg = HFConfig(**TINY_BASE)
    tm = HFHubert(hf_cfg)
    cfg = HubertConfig.from_hf(hf_cfg)
    for n in (400, 999, 2000, 3201):
        want = int(tm._get_feat_extract_output_lengths(torch.tensor(n)))
        assert int(cfg.feature_lengths(np.array([n]))[0]) == want


def test_tap_layer_matches_hf_hidden_states(rng):
    """fairseq output_layer=N == hidden state entering layer N (== HF
    output_hidden_states[N]); used by I_da feature extraction."""
    tm, cfg, params = make_pair(TINY_BASE)
    wav = rng.standard_normal((1, 1600)).astype(np.float32) * 0.1
    with torch.no_grad():
        hs = tm(torch.from_numpy(wav), output_hidden_states=True).hidden_states
    got = np.asarray(HubertModel(cfg).apply(
        {"params": params}, jnp.asarray(wav), tap_layer=1))
    np.testing.assert_allclose(got, hs[1].numpy(), atol=2e-4, rtol=1e-3)


def test_hubert_grad_flow(rng):
    cfg = HubertConfig(**{k: tuple(v) if isinstance(v, list) else v
                          for k, v in TINY_BASE.items()})
    model = EncoderWithHead(cfg, out_dim=5)
    wav = jnp.asarray(rng.standard_normal((1, 1600)).astype(np.float32) * 0.1)
    variables = model.init(jax.random.PRNGKey(0), wav)

    def loss_fn(p):
        return jnp.mean(jnp.square(model.apply({"params": p}, wav)))

    grads = jax.grad(loss_fn)(variables["params"])
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert any(float(jnp.abs(l).max()) > 0 for l in leaves)


def test_chunked_feature_extraction(rng):
    from speech_inpainting_tpu.models.hubert import extract_features_chunked
    cfg = HubertConfig(**{k: tuple(v) if isinstance(v, list) else v
                          for k, v in TINY_BASE.items()})
    model = HubertModel(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 3200)))["params"]
    wav = rng.standard_normal(4000).astype(np.float32) * 0.1
    chunked = extract_features_chunked(model, params, wav, chunk=2000)
    # equals running the model on each 2000-sample piece independently
    # (the reference concatenates per-chunk features; global attention makes
    # this differ from a single full pass by design)
    w1 = np.asarray(model.apply({"params": params},
                                jnp.asarray(wav[:2000])[None])[0])
    w2 = np.asarray(model.apply({"params": params},
                                jnp.asarray(wav[2000:])[None])[0])
    want = np.concatenate([w1, w2])
    assert chunked.shape == want.shape
    np.testing.assert_allclose(chunked, want, atol=1e-5)
    # pieces shorter than one receptive field are dropped, not crashed
    tail = extract_features_chunked(model, params, wav[:5], chunk=2000)
    assert tail.shape == (0, cfg.hidden_size)


def test_fairseq_converter_mapping(rng):
    """convert_fairseq_hubert maps fairseq key names onto the same tensors as
    the HF converter (synthetic fairseq-named state dict from the HF one)."""
    from speech_inpainting_tpu.convert.hubert_torch import \
        convert_fairseq_hubert
    tm, cfg, hf_params = make_pair(TINY_BASE)
    sd = tm.state_dict()
    fs = {}
    for k, v in sd.items():
        k2 = k
        k2 = k2.replace("feature_extractor.conv_layers.", "FECL.")
        import re
        m = re.match(r"FECL\.(\d+)\.conv\.(weight|bias)", k2)
        if m:
            fs[f"feature_extractor.conv_layers.{m.group(1)}.0.{m.group(2)}"] = v
            continue
        m = re.match(r"FECL\.(\d+)\.layer_norm\.(weight|bias)", k2)
        if m:
            fs[f"feature_extractor.conv_layers.{m.group(1)}.2.{m.group(2)}"] = v
            continue
        if k.startswith("feature_projection.layer_norm."):
            fs[k.replace("feature_projection.layer_norm", "layer_norm")] = v
        elif k.startswith("feature_projection.projection."):
            fs[k.replace("feature_projection.projection",
                         "post_extract_proj")] = v
        elif k.startswith("encoder.pos_conv_embed.conv."):
            fs[k.replace("encoder.pos_conv_embed.conv",
                         "encoder.pos_conv.0")
               .replace("parametrizations.weight.original0", "weight_g")
               .replace("parametrizations.weight.original1", "weight_v")] = v
        elif ".attention." in k:
            fs[k.replace(".attention.", ".self_attn.")] = v
        elif ".layer_norm." in k and ".layers." in k:
            fs[k.replace(".layer_norm.", ".self_attn_layer_norm.")] = v
        elif ".feed_forward.intermediate_dense." in k:
            fs[k.replace(".feed_forward.intermediate_dense.", ".fc1.")] = v
        elif ".feed_forward.output_dense." in k:
            fs[k.replace(".feed_forward.output_dense.", ".fc2.")] = v
        else:
            fs[k] = v
    fs_params = convert_fairseq_hubert(fs, cfg)
    for (ka, a), (kb, b) in zip(
            sorted(jax.tree_util.tree_leaves_with_path(fs_params),
                   key=lambda kv: str(kv[0])),
            sorted(jax.tree_util.tree_leaves_with_path(hf_params),
                   key=lambda kv: str(kv[0]))):
        assert str(ka) == str(kb)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
