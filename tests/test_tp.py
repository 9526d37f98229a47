"""Tensor-parallel HuBERT (parallel/tp.py): Megatron-style param sharding
over a ('dp','tp') mesh must reproduce single-device forward passes and
EA training steps. The reference has no TP (SURVEY.md §2.4 — its models fit
one GPU); this is the TPU-native scale-out knob, so the contract is pure
equivalence: the step functions are untouched and GSPMD inserts the
collectives that Megatron issues by hand."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from speech_inpainting_tpu.models.hubert import HubertConfig, EncoderWithHead
from speech_inpainting_tpu.parallel.mesh import make_mesh
from speech_inpainting_tpu.parallel.tp import (check_tp, shard_params,
                                               tp_spec, tp_specs)
from speech_inpainting_tpu.train.ea import (EAConfig, create_state,
                                            make_train_step)

HCFG = HubertConfig(conv_dim=(8,) * 7, hidden_size=32, num_hidden_layers=2,
                    num_attention_heads=4, intermediate_size=48,
                    num_conv_pos_embeddings=15,
                    num_conv_pos_embedding_groups=1)


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    model = EncoderWithHead(HCFG, out_dim=16)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 3200)))["params"]
    centroids = rng.standard_normal((7, 16)).astype(np.float32)
    B, T = 4, 3200  # 10 feature frames
    batch = {
        "wav": (rng.standard_normal((B, T)) * 0.1).astype(np.float32),
        "attn_mask": np.ones((B, T), np.int32),
        "mask_pos": rng.integers(0, 6, B).astype(np.int32),
        "labels": rng.integers(0, 7, (B, 4)).astype(np.int32),
    }
    return model, params, centroids, batch


def test_tp_spec_rules(setup):
    _, params, _, _ = setup
    specs = tp_specs(params)
    att = specs["hubert"]["layers_0"]["attention"]
    assert att["q_proj"]["kernel"] == P(None, "tp")
    assert att["q_proj"]["bias"] == P("tp")
    assert att["out_proj"]["kernel"] == P("tp", None)
    assert att["out_proj"]["bias"] == P()
    ff = specs["hubert"]["layers_0"]["feed_forward"]
    assert ff["intermediate_dense"]["kernel"] == P(None, "tp")
    assert ff["output_dense"]["kernel"] == P("tp", None)
    assert ff["output_dense"]["bias"] == P()
    # frontend/head replicate
    assert specs["head"]["linear"]["kernel"] == P()
    assert specs["hubert"]["fp_projection"]["kernel"] == P()
    # axis renaming
    assert tp_spec("attention/q_proj/kernel", axis="model") == P(None, "model")


def test_tp_forward_matches_single_device(setup):
    model, params, _, batch = setup
    mesh = make_mesh((("dp", 2), ("tp", 4)))
    check_tp(HCFG, mesh)

    fwd = jax.jit(lambda p, w, m: model.apply({"params": p}, w, m))
    want = np.asarray(fwd(params, batch["wav"], batch["attn_mask"]))

    tparams = shard_params(mesh, params)
    q = tparams["hubert"]["layers_0"]["attention"]["q_proj"]["kernel"]
    assert not q.sharding.is_fully_replicated  # really sharded
    dp = NamedSharding(mesh, P("dp"))
    got = fwd(tparams, jax.device_put(batch["wav"], dp),
              jax.device_put(batch["attn_mask"], dp))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=1e-5)


def test_tp_train_step_matches_single_device(setup):
    model, params, centroids, batch = setup
    cfg = EAConfig(mask_length=4)
    step = jax.jit(make_train_step(model, cfg, centroids))

    state = create_state(cfg, params)
    metrics_ref = []
    for _ in range(3):
        state, m = step(state, batch)
        metrics_ref.append({k: float(v) for k, v in m.items()})

    mesh = make_mesh((("dp", 2), ("tp", 4)))
    tstate = create_state(cfg, shard_params(mesh, params))
    dp = NamedSharding(mesh, P("dp"))
    tbatch = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, dp), batch)
    for i in range(3):
        tstate, m = step(tstate, tbatch)
        for k, want in metrics_ref[i].items():
            np.testing.assert_allclose(float(m[k]), want, rtol=2e-4,
                                       atol=1e-6, err_msg=f"step {i} {k}")

    # updated params equal leaf-for-leaf, and stayed sharded
    for (ka, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(tstate.params),
            jax.tree_util.tree_leaves_with_path(state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=2e-6, err_msg=str(ka))
    q = tstate.params["hubert"]["layers_0"]["attention"]["q_proj"]["kernel"]
    assert not q.sharding.is_fully_replicated
