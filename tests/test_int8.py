"""int8 W8A8 serving path: quantizer properties, dot error bounds, Dense
drop-in param compatibility, and the end-to-end encoder under cfg.int8."""
import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from flax import linen as nn

from speech_inpainting_tpu.ops.int8 import (
    Int8Dense, dynamic_int8_dot, quantize_cols, quantize_rows)
from speech_inpainting_tpu.models.hubert import EncoderWithHead, HubertConfig


def test_quantize_rows_properties(rng):
    x = rng.standard_normal((5, 64)).astype(np.float32) * \
        np.array([1e-3, 1.0, 50.0, 1.0, 1.0], np.float32)[:, None]
    x[3] = 0.0                                   # all-zero row
    q, s = quantize_rows(jnp.asarray(x))
    assert q.dtype == jnp.int8 and s.shape == (5, 1)
    assert int(jnp.max(jnp.abs(q))) <= 127
    # the row max hits +/-127 exactly; dequantization error <= half a step
    err = np.abs(np.asarray(q, np.float32) * np.asarray(s) - x)
    assert np.all(err <= 0.5 * np.asarray(s) + 1e-9)
    assert np.all(np.asarray(q[3]) == 0)         # zero row -> zero codes
    nz = np.abs(np.asarray(q)).max(axis=1)
    assert list(nz[[0, 1, 2, 4]]) == [127] * 4


def test_quantize_cols_matches_rows_transposed(rng):
    w = rng.standard_normal((32, 16)).astype(np.float32)
    qc, sc = quantize_cols(jnp.asarray(w))
    qr, sr = quantize_rows(jnp.asarray(w.T))
    np.testing.assert_array_equal(np.asarray(qc), np.asarray(qr).T)
    np.testing.assert_allclose(np.asarray(sc)[0], np.asarray(sr)[:, 0])


def test_dynamic_int8_dot_error_bound(rng):
    x = rng.standard_normal((40, 256)).astype(np.float32)
    w = rng.standard_normal((256, 128)).astype(np.float32)
    want = x @ w
    got = np.asarray(dynamic_int8_dot(jnp.asarray(x), jnp.asarray(w)))
    rel = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert rel < 0.01, rel
    # scale invariance: per-row/per-col symmetric quant is exact under
    # positive row/column rescaling of the inputs
    got2 = np.asarray(dynamic_int8_dot(jnp.asarray(x * 100.0),
                                       jnp.asarray(w)))
    np.testing.assert_allclose(got2, got * 100.0, rtol=1e-5, atol=1e-4)


def test_int8_dense_is_param_compatible_with_nn_dense(rng):
    x = jnp.asarray(rng.standard_normal((3, 24)).astype(np.float32))
    ref = nn.Dense(8, param_dtype=jnp.float32)
    params = ref.init(jax.random.PRNGKey(0), x)["params"]
    assert set(params) == {"kernel", "bias"}
    q = Int8Dense(8)
    qparams = q.init(jax.random.PRNGKey(0), x)["params"]
    assert jax.tree_util.tree_structure(params) == \
        jax.tree_util.tree_structure(qparams)
    # the SAME f32 params drive both; outputs agree to quantization error
    want = np.asarray(ref.apply({"params": params}, x))
    got = np.asarray(q.apply({"params": params}, x))
    rel = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert rel < 0.02, rel


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_encoder_int8_flag_same_params_close_output(rng, dtype):
    cfg = HubertConfig(conv_dim=(8,) * 7, hidden_size=16, num_hidden_layers=2,
                       num_attention_heads=2, intermediate_size=24,
                       num_conv_pos_embeddings=15,
                       num_conv_pos_embedding_groups=1, dtype=dtype)
    model = EncoderWithHead(cfg, out_dim=12)
    wav = jnp.asarray(rng.standard_normal((2, 6400)).astype(np.float32) * 0.1)
    params = model.init(jax.random.PRNGKey(0), wav)["params"]

    want = np.asarray(model.apply({"params": params}, wav), np.float32)
    qmodel = EncoderWithHead(dataclasses.replace(cfg, int8=True), out_dim=12)
    got = np.asarray(qmodel.apply({"params": params}, wav), np.float32)
    assert got.shape == want.shape
    rel = np.linalg.norm(got - want) / np.linalg.norm(want)
    # 2 transformer layers of W8A8 on top of bf16/f32 conv features
    assert rel < 0.05, rel
    # and the two parameter trees are interchangeable by construction
    qp = qmodel.init(jax.random.PRNGKey(1), wav)["params"]
    assert jax.tree_util.tree_structure(qp) == \
        jax.tree_util.tree_structure(params)
