"""Quantization layer tests: k-means assignment/fit parity and EMA-VQ parity
with the reference torch BottleneckBlock (including SPMD psum equivalence)."""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from speech_inpainting_tpu.quantize.kmeans import (
    KMeans, assign, fit_kmeans, pairwise_sqdist, quantize_to_centroids)
from speech_inpainting_tpu.quantize.vq import EMAVectorQuantizer

from reference_loader import ref_vq


def blobs(rng, n=4000, k=10, d=8, spread=5.0):
    centers = rng.standard_normal((k, d)) * spread
    labels = rng.integers(0, k, n)
    return (centers[labels] + rng.standard_normal((n, d))).astype(np.float32)


def test_assign_matches_sklearn(rng):
    from sklearn.cluster import MiniBatchKMeans
    x = blobs(rng)
    km = MiniBatchKMeans(n_clusters=10, n_init=3, random_state=0).fit(x)
    want = km.predict(x)
    got = np.asarray(assign(jnp.asarray(x),
                            jnp.asarray(km.cluster_centers_, jnp.float32)))
    assert (got == want).mean() > 0.999  # ties at float boundaries only


def test_assign_matches_reference_formula(rng):
    """ApplyKmeans computes ‖x‖²−2xC+‖C‖² then argmin (km_label.py:26-34)."""
    x = rng.standard_normal((100, 16)).astype(np.float32)
    C = rng.standard_normal((7, 16)).astype(np.float32)
    want_d = (x ** 2).sum(1, keepdims=True) - 2 * x @ C.T + (C ** 2).sum(1)
    got_d = np.asarray(pairwise_sqdist(jnp.asarray(x), jnp.asarray(C)))
    np.testing.assert_allclose(got_d, want_d, atol=1e-3)
    assert (np.asarray(assign(jnp.asarray(x), jnp.asarray(C)))
            == want_d.argmin(1)).all()


def test_fit_kmeans_quality(rng):
    """On-device Lloyd must reach sklearn-MiniBatchKMeans-level inertia."""
    from sklearn.cluster import MiniBatchKMeans
    x = blobs(rng, n=6000)
    km = MiniBatchKMeans(n_clusters=10, n_init=3, batch_size=1024,
                         random_state=0).fit(x)
    sk_inertia = -km.score(x) / len(x)
    C, inertia = fit_kmeans(x, 10, iters=25, chunk=1000)
    assert C.shape == (10, 8)
    assert inertia <= sk_inertia * 1.05, (inertia, sk_inertia)


def test_joblib_roundtrip(tmp_path, rng):
    from sklearn.cluster import MiniBatchKMeans
    x = blobs(rng, n=1000)
    skm = MiniBatchKMeans(n_clusters=5, n_init=1, random_state=0).fit(x)
    import joblib
    p = tmp_path / "model.km"
    joblib.dump(skm, p)
    km = KMeans.load_joblib(str(p))
    assert (np.asarray(km(jnp.asarray(x))) == skm.predict(x)).mean() > 0.999
    q = np.asarray(km.quantize(jnp.asarray(x[:4])))
    np.testing.assert_allclose(q, skm.cluster_centers_[skm.predict(x[:4])],
                               atol=1e-5)


# ---------------------------------------------------------------------------
# EMA-VQ
# ---------------------------------------------------------------------------

K_BINS, EMB, MU = 12, 6, 0.97


def init_state(rng):
    k = rng.standard_normal((K_BINS, EMB)).astype(np.float32)
    return {
        "k": k.copy(),
        # counts above threshold so no random restarts fire → deterministic
        "k_sum": (k * 3.0).copy(),
        "k_elem": np.full((K_BINS,), 3.0, np.float32),
        "initted": np.ones((), bool),
    }


def run_ref_block(state, x, train: bool):
    vqm = ref_vq()
    blk = vqm.BottleneckBlock(K_BINS, EMB, MU)
    blk.k = torch.from_numpy(state["k"].copy())
    blk.k_sum = torch.from_numpy(state["k_sum"].copy())
    blk.k_elem = torch.from_numpy(state["k_elem"].copy())
    blk.init = True
    blk.train(train)
    xt = torch.from_numpy(x.copy())
    x_l, x_d, commit, metrics = blk(xt, update_k=train)
    return blk, x_l.numpy(), x_d.detach().numpy(), float(commit), metrics


@pytest.mark.parametrize("train", [False, True], ids=["eval", "train"])
def test_vq_parity_with_reference(rng, train):
    state = init_state(rng)
    x = rng.standard_normal((2, EMB, 10)).astype(np.float32) * 2.0

    blk, want_l, want_d, want_commit, _ = run_ref_block(state, x, train)

    m = EMAVectorQuantizer(K_BINS, EMB, MU)
    variables = {"vq": jax.tree_util.tree_map(jnp.asarray, state)}
    (got_l, got_d, got_commit, metrics), upd = m.apply(
        variables, jnp.asarray(x), train=train,
        rngs={"vq": jax.random.PRNGKey(0)}, mutable=["vq"])

    np.testing.assert_array_equal(np.asarray(got_l), want_l)
    np.testing.assert_allclose(np.asarray(got_d), want_d, atol=1e-5)
    np.testing.assert_allclose(float(got_commit), want_commit, rtol=1e-5)
    if train:
        np.testing.assert_allclose(np.asarray(upd["vq"]["k_sum"]),
                                   blk.k_sum.numpy(), atol=1e-5)
        np.testing.assert_allclose(np.asarray(upd["vq"]["k_elem"]),
                                   blk.k_elem.numpy(), atol=1e-5)
        np.testing.assert_allclose(np.asarray(upd["vq"]["k"]),
                                   blk.k.numpy(), atol=1e-5)


def test_vq_init_from_first_batch(rng):
    """First training batch must initialize the codebook from the data."""
    m = EMAVectorQuantizer(K_BINS, EMB, MU)
    x = jnp.asarray(rng.standard_normal((1, EMB, 32)).astype(np.float32))
    variables = m.init({"params": jax.random.PRNGKey(0),
                        "vq": jax.random.PRNGKey(1)}, x, train=False)
    assert not bool(variables["vq"]["initted"])
    (_, _, _, _), upd = m.apply(variables, x, train=True,
                                rngs={"vq": jax.random.PRNGKey(2)},
                                mutable=["vq"])
    assert bool(upd["vq"]["initted"])
    flat = np.asarray(x)[0].T
    k = np.asarray(upd["vq"]["k"])
    assert np.isfinite(k).all() and np.abs(k).max() > 0
    # after init_k + one EMA step every code stays inside the data's range
    # (each is a convex mix of batch rows — mirrors reference init_k+update_k)
    assert k.min() >= flat.min() - 1e-5 and k.max() <= flat.max() + 1e-5


def test_vq_straight_through_gradient(rng):
    m = EMAVectorQuantizer(K_BINS, EMB, MU)
    x = jnp.asarray(rng.standard_normal((1, EMB, 8)).astype(np.float32))
    variables = m.init({"params": jax.random.PRNGKey(0),
                        "vq": jax.random.PRNGKey(1)}, x, train=True)

    def loss(x):
        _, x_d, commit, _ = m.apply(variables, x, train=True, update_k=False,
                                    rngs={"vq": jax.random.PRNGKey(2)})
        return jnp.sum(x_d * 2.0) + commit

    g = jax.grad(loss)(x)
    # straight-through: d(sum 2*x_d)/dx == 2 everywhere (+ commit grad)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 1.0


def test_vq_psum_matches_single_device(rng):
    """shard_map over 8 CPU devices must produce the same codebook update as
    one device seeing the concatenated batch (the dist.all_reduce contract)."""
    from jax.sharding import Mesh, PartitionSpec as P
    from jax.experimental.shard_map import shard_map

    state = init_state(rng)
    x = rng.standard_normal((8, EMB, 16)).astype(np.float32) * 2.0
    variables = {"vq": jax.tree_util.tree_map(jnp.asarray, state)}

    single = EMAVectorQuantizer(K_BINS, EMB, MU)
    _, upd1 = single.apply(variables, jnp.asarray(x), train=True,
                           rngs={"vq": jax.random.PRNGKey(0)}, mutable=["vq"])

    sharded = EMAVectorQuantizer(K_BINS, EMB, MU, axis_name="dp")
    mesh = Mesh(np.array(jax.devices()[:8]), ("dp",))

    def step(v, xs):
        (_, _, _, _), upd = sharded.apply(
            v, xs, train=True, rngs={"vq": jax.random.PRNGKey(0)},
            mutable=["vq"])
        return upd

    f = shard_map(step, mesh=mesh,
                  in_specs=(P(), P("dp")), out_specs=P(),
                  check_rep=False)
    upd8 = f(variables, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(upd8["vq"]["k_sum"]),
                               np.asarray(upd1["vq"]["k_sum"]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(upd8["vq"]["k_elem"]),
                               np.asarray(upd1["vq"]["k_elem"]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(upd8["vq"]["k"]),
                               np.asarray(upd1["vq"]["k"]), atol=1e-4)


def test_codebook_diagnostics(rng):
    from speech_inpainting_tpu.quantize.kmeans import codebook_diagnostics
    C = rng.standard_normal((20, 8)).astype(np.float32)
    d = codebook_diagnostics(C)
    assert d["k"] == 20 and -1 <= d["cos_sim_mean"] <= 1
    # collapsed codebook flags near-1 similarity
    collapsed = np.tile(C[:1], (20, 1)) + 1e-6 * rng.standard_normal((20, 8))
    assert codebook_diagnostics(collapsed)["cos_sim_mean"] > 0.9
