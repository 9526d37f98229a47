"""I_ea training-step tests: loss decreases, two-group optimizer behavior,
frozen-encoder mode, and data-parallel sharding over the 8-device CPU mesh."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from speech_inpainting_tpu.models.hubert import EncoderWithHead, HubertConfig
from speech_inpainting_tpu.train.ea import (EAConfig, create_state, eval_step,
                                            make_train_step)

TINY = HubertConfig(conv_dim=(8,) * 7, hidden_size=16, num_hidden_layers=1,
                    num_attention_heads=2, intermediate_size=24,
                    num_conv_pos_embeddings=15,
                    num_conv_pos_embedding_groups=1)


def make_batch(rng, cfg, B=4, T=3200, k=10):
    n_frames = int(TINY.feature_lengths(np.array([T]))[0])
    return {
        "wav": rng.standard_normal((B, T)).astype(np.float32) * 0.1,
        "attn_mask": np.ones((B, T), np.int32),
        "mask_pos": rng.integers(0, n_frames - cfg.mask_length, B).astype(np.int32),
        "labels": rng.integers(0, k, (B, cfg.mask_length)).astype(np.int32),
    }


def setup(rng, **cfg_over):
    cfg = EAConfig(mask_length=3, **cfg_over)
    model = EncoderWithHead(TINY, out_dim=8)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 3200)))["params"]
    centroids = rng.standard_normal((10, 8)).astype(np.float32)
    return cfg, model, params, centroids


@pytest.mark.parametrize("loss", ["cos_sim", "mse", "softmax"])
def test_train_step_improves_loss(rng, loss):
    out_dim = 10 if loss == "softmax" else 8
    cfg = EAConfig(mask_length=3, loss=loss, base_lr=1e-3, fc_lr=1e-3)
    model = EncoderWithHead(TINY, out_dim=out_dim)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 3200)))["params"]
    centroids = rng.standard_normal((10, 8)).astype(np.float32)
    state = create_state(cfg, params)
    step = jax.jit(make_train_step(model, cfg, centroids))
    batch = make_batch(rng, cfg)
    _, m0 = step(state, batch)
    for _ in range(12):
        state, m = step(state, batch)
    assert float(m["loss"]) < float(m0["loss"])
    assert np.isfinite(float(m["loss"]))
    assert 0.0 <= float(m["acc"]) <= 1.0


def test_ea_bf16_step_tracks_f32(rng):
    """HubertConfig(dtype=bf16) — bf16 matmul/conv compute, f32 params and
    loss reductions — must track the f32 EA step: same param tree, losses
    within bf16 tolerance, updated params close, still learns. Pins the
    sit-train-ea bf16 DEFAULT (+7% steps/s measured compute-bound,
    BENCH_TRAIN_r03.json; reference trains f32, I_ea/main.py:144-266)."""
    cfg = EAConfig(mask_length=3, base_lr=1e-3, fc_lr=1e-3)
    centroids = rng.standard_normal((10, 8)).astype(np.float32)
    batch = make_batch(rng, cfg)
    params = EncoderWithHead(TINY, out_dim=8).init(
        jax.random.PRNGKey(0), jnp.zeros((1, 3200)))["params"]
    results = []
    for dtype in (jnp.float32, jnp.bfloat16):
        import dataclasses
        model = EncoderWithHead(dataclasses.replace(TINY, dtype=dtype),
                                out_dim=8)
        step = jax.jit(make_train_step(model, cfg, centroids))
        state = create_state(cfg, params)
        state, m = step(state, batch)
        results.append((step, state, m))
    (_, s0, m0), (stepb, s1, m1) = results
    assert all(a.dtype == jnp.float32
               for a in jax.tree_util.tree_leaves(s1.params))
    np.testing.assert_allclose(float(m1["loss"]), float(m0["loss"]),
                               rtol=2e-2)
    for (ka, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(s1.params),
            jax.tree_util.tree_leaves_with_path(s0.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-3,
                                   err_msg=str(ka))
    state, mfirst = s1, m1
    for _ in range(12):
        state, m = stepb(state, batch)
    assert np.isfinite(float(m["loss"]))
    assert float(m["loss"]) < float(mfirst["loss"])


def test_ea_bucketed_step_close_to_full_padding(rng):
    """Bucketed padding (data/ea_dataset.py batches(buckets=...)) is the
    per-batch dynamic padding torch/HF pipelines use, with the same inherited
    caveat: HuBERT's conv-frontend GroupNorm spans pad frames (HF-parity
    semantics), so outputs are weakly pad-length-dependent rather than
    identical. Pin that the dependence stays small at this scale — a step on
    the same utterances/masks/labels padded to a tight bucket vs. 2x that
    length agrees on loss within ~2% and on updated params closely — and
    that accuracy (an argmax) is typically unmoved."""
    cfg, model, params, centroids = setup(rng)
    step = jax.jit(make_train_step(model, cfg, centroids))
    B, L = 2, cfg.mask_length
    true_lens = np.array([2000, 2600])
    tight, full = 3200, 6400
    wav_t = np.zeros((B, tight), np.float32)
    for b, t in enumerate(true_lens):
        wav_t[b, :t] = rng.standard_normal(t).astype(np.float32) * 0.1
    wav_f = np.zeros((B, full), np.float32)
    wav_f[:, :tight] = wav_t
    masks = {
        tight: (np.arange(tight)[None] < true_lens[:, None]).astype(np.int32),
        full: (np.arange(full)[None] < true_lens[:, None]).astype(np.int32),
    }
    max_pos = (true_lens - 80) // 320 - L
    mask_pos = np.array([rng.integers(0, m) for m in max_pos], np.int32)
    labels = rng.integers(0, 10, (B, L)).astype(np.int32)
    outs = []
    for wav, T in ((wav_t, tight), (wav_f, full)):
        state = create_state(cfg, params)
        new_state, m = step(state, {"wav": wav, "attn_mask": masks[T],
                                    "mask_pos": mask_pos, "labels": labels})
        outs.append((new_state, m))
    (s1, m1), (s2, m2) = outs
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=2e-2)
    assert abs(float(m1["acc"]) - float(m2["acc"])) <= 1.0 / (2 * 3) + 1e-6
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0.1, atol=2e-3)


def test_frozen_encoder_mode(rng):
    cfg, model, params, centroids = setup(rng, train_encoder=False)
    state = create_state(cfg, params)
    step = jax.jit(make_train_step(model, cfg, centroids))
    batch = make_batch(rng, cfg)
    new_state, _ = step(state, batch)
    # encoder unchanged, head changed
    def maxdiff(a, b):
        return max(float(jnp.abs(x - y).max()) for x, y in zip(
            jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)))
    assert maxdiff(new_state.params["hubert"], state.params["hubert"]) == 0.0
    assert maxdiff(new_state.params["head"], state.params["head"]) > 0.0


def test_eval_step_matches_loss(rng):
    cfg, model, params, centroids = setup(rng)
    ev = eval_step(model, cfg, centroids)
    batch = make_batch(rng, cfg)
    m = ev(params, batch)
    assert np.isfinite(float(m["loss"]))


def test_dryrun_multichip_8_devices():
    import sys
    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import dryrun_multichip
    dryrun_multichip(8)


def test_data_parallel_matches_single_device(rng):
    """The pjit'd step over 8 devices must equal the single-device step."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from speech_inpainting_tpu.parallel.mesh import make_mesh

    cfg, model, params, centroids = setup(rng)
    step = make_train_step(model, cfg, centroids)
    batch = make_batch(rng, cfg, B=8)
    state = create_state(cfg, params)

    s1, m1 = jax.jit(step)(state, batch)

    mesh = make_mesh()
    repl, data = NamedSharding(mesh, P()), NamedSharding(mesh, P("dp"))
    state_r = jax.device_put(state, repl)
    batch_r = jax.tree_util.tree_map(lambda x: jax.device_put(x, data), batch)
    s8, m8 = jax.jit(step, in_shardings=(repl, data),
                     out_shardings=(repl, repl))(state_r, batch_r)
    np.testing.assert_allclose(float(m8["loss"]), float(m1["loss"]),
                               rtol=2e-4)
    for a, b in zip(jax.tree_util.tree_leaves(s8.params),
                    jax.tree_util.tree_leaves(s1.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_grad_accum_matches_full_batch(rng):
    """grad_accum=K sums microbatch grads of the SUM-reduced reference
    losses, so the update equals the full-batch step exactly (up to f32
    reorder) — accumulation trades peak activation memory, not semantics."""
    _, model, params, centroids = setup(rng)
    outs = []
    for accum in (1, 2):
        cfg = EAConfig(mask_length=3, grad_accum=accum)
        state = create_state(cfg, params)
        step = jax.jit(make_train_step(model, cfg, centroids))
        batch_rng = np.random.default_rng(7)
        batch = make_batch(batch_rng, cfg, B=4)
        new_state, m = step(state, batch)
        outs.append((new_state, m))
    (s1, m1), (s2, m2) = outs
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-6)
    assert float(m1["acc"]) == float(m2["acc"])
    # atol covers Adam's step-1 normalization amplifying f32-reorder noise
    # on near-zero grads (update scale is lr=1e-4; observed diffs <1e-6)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)


def test_grad_accum_composes_with_mesh(rng):
    """grad_accum reshapes the dp-sharded batch (B,)->(K, B/K) before the
    scan; GSPMD must handle that resharding without changing the update."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from speech_inpainting_tpu.parallel.mesh import make_mesh

    _, model, params, centroids = setup(rng)
    batch = make_batch(np.random.default_rng(3), EAConfig(mask_length=3), B=8)

    cfg1 = EAConfig(mask_length=3)
    s1, m1 = jax.jit(make_train_step(model, cfg1, centroids))(
        create_state(cfg1, params), batch)

    cfg2 = EAConfig(mask_length=3, grad_accum=2)
    mesh = make_mesh()
    repl, data = NamedSharding(mesh, P()), NamedSharding(mesh, P("dp"))
    state_r = jax.device_put(create_state(cfg2, params), repl)
    batch_r = jax.tree.map(lambda x: jax.device_put(x, data), batch)
    s2, m2 = jax.jit(make_train_step(model, cfg2, centroids),
                     in_shardings=(repl, data),
                     out_shardings=(repl, repl))(state_r, batch_r)
    np.testing.assert_allclose(float(m2["loss"]), float(m1["loss"]),
                               rtol=2e-4)
    for a, b in zip(jax.tree.leaves(s2.params), jax.tree.leaves(s1.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6)


def test_skip_nonfinite_guard(rng):
    """EAConfig.skip_nonfinite: a nan batch leaves params AND optimizer
    moments untouched (the whole update is skipped), and the next finite
    batch still applies — one bad batch can't nan the run."""
    _, model, params, centroids = setup(rng)
    cfg = EAConfig(mask_length=3, skip_nonfinite=5)
    state = create_state(cfg, params)
    step = jax.jit(make_train_step(model, cfg, centroids))
    batch = make_batch(np.random.default_rng(5), cfg, B=2)
    bad = dict(batch, wav=batch["wav"].at[0, 10].set(np.nan)
               if hasattr(batch["wav"], "at")
               else np.where(np.arange(batch["wav"].size).reshape(
                   batch["wav"].shape) == 10, np.nan, batch["wav"]))
    s_bad, m_bad = step(state, bad)
    for a, b in zip(jax.tree.leaves(s_bad.params),
                    jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert not np.isfinite(float(m_bad["loss"]))
    s_ok, m_ok = step(s_bad, batch)
    assert np.isfinite(float(m_ok["loss"]))
    assert any(float(jnp.abs(a - b).max()) > 0 for a, b in zip(
        jax.tree.leaves(s_ok.params), jax.tree.leaves(s_bad.params)))
