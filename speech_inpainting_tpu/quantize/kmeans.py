"""TPU-native k-means: matmul nearest-centroid assignment + on-device fitting.

Replaces the reference's sklearn MiniBatchKMeans pipeline
(I_ea/dataset/kmeans_learn.py:8-109) and the vectorized `ApplyKmeans`
assignment (I_ea/dataset/km_label.py:10-34, ‖x‖²−2xC+‖C‖²). Assignment is one
GEMM on the MXU; fitting runs entirely on device as kmeans++ seeding followed
by Lloyd/mini-batch iterations with segment-sum centroid updates under
`lax.scan` — no host round-trips per step.

All functions are pure. `KMeans` is a thin pytree wrapper holding (K, D)
centroids; `load_joblib` imports reference sklearn models.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def pairwise_sqdist(x, C, x_sq=None):
    """‖x−c‖² for x (N, D), C (K, D) → (N, K), one MXU matmul.

    `x_sq` (N,) may be precomputed. Matches the reference's expansion
    ‖x‖² − 2xCᵀ + ‖C‖² (km_label.py:26-34) including its numerics.
    """
    if x_sq is None:
        x_sq = jnp.sum(jnp.square(x), axis=-1)
    c_sq = jnp.sum(jnp.square(C), axis=-1)
    cross = x @ C.T
    return x_sq[:, None] - 2.0 * cross + c_sq[None, :]


def assign(x, C):
    """Nearest-centroid labels for x (..., D) against C (K, D) → (...,) int32."""
    flat = x.reshape(-1, x.shape[-1])
    labels = jnp.argmin(pairwise_sqdist(flat, C), axis=-1)
    return labels.reshape(x.shape[:-1]).astype(jnp.int32)


def assign_and_distance(x, C):
    flat = x.reshape(-1, x.shape[-1])
    d = pairwise_sqdist(flat, C)
    labels = jnp.argmin(d, axis=-1)
    mind = jnp.take_along_axis(d, labels[:, None], axis=-1)[:, 0]
    return (labels.reshape(x.shape[:-1]).astype(jnp.int32),
            mind.reshape(x.shape[:-1]))


def quantize_to_centroids(x, C):
    """Replace each vector by its nearest centroid (the reference's mel_c /
    centroid-substitution step, meldataset_modified.py:155-171)."""
    return jnp.take(C, assign(x, C), axis=0)


@partial(jax.jit, static_argnames=("k",))
def _kmeanspp_init(key, x, k: int):
    """kmeans++ seeding (single candidate per step, D² sampling) on device."""
    n = x.shape[0]
    k0, key = jax.random.split(key)
    first = x[jax.random.randint(k0, (), 0, n)]
    d2 = jnp.sum(jnp.square(x - first), axis=-1)
    C0 = jnp.zeros((k, x.shape[-1]), x.dtype).at[0].set(first)

    def step(carry, ki):
        C, d2, i = carry
        # D² sampling via gumbel-max (cheap to compile vs sort-based choice)
        idx = jax.random.categorical(ki, jnp.log(jnp.maximum(d2, 1e-30)))
        c = x[idx]
        C = C.at[i].set(c)
        d2 = jnp.minimum(d2, jnp.sum(jnp.square(x - c), axis=-1))
        return (C, d2, i + 1), None

    keys = jax.random.split(key, k - 1)
    (C, _, _), _ = jax.lax.scan(step, (C0, d2, 1), keys)
    return C


def _chunked_stats(x, C, chunk: int):
    """One Lloyd E+M pass over x in `chunk`-row tiles via scan.

    Returns (sums (K, D), counts (K,), inertia). x length must be divisible
    by chunk (pad upstream with weight-0 rows if needed).
    """
    k = C.shape[0]
    xr = x.reshape(-1, chunk, x.shape[-1])

    def step(carry, xb):
        sums, counts, inertia = carry
        labels, mind = assign_and_distance(xb, C)
        one_hot = jax.nn.one_hot(labels, k, dtype=x.dtype)     # (chunk, K)
        sums = sums + one_hot.T @ xb
        counts = counts + jnp.sum(one_hot, axis=0)
        return (sums, counts, inertia + jnp.sum(mind)), None

    init = (jnp.zeros((k, x.shape[-1]), x.dtype), jnp.zeros((k,), x.dtype),
            jnp.asarray(0.0, x.dtype))
    (sums, counts, inertia), _ = jax.lax.scan(step, init, xr)
    return sums, counts, inertia


@partial(jax.jit, static_argnames=("iters", "chunk"))
def _lloyd(key, x, C, iters: int, chunk: int):
    n = x.shape[0]

    def step(carry, ki):
        C, _ = carry
        sums, counts, inertia = _chunked_stats(x, C, chunk)
        newC = sums / jnp.maximum(counts, 1.0)[:, None]
        # dead clusters: restart from a random data point
        rand = x[jax.random.randint(ki, (C.shape[0],), 0, n)]
        alive = (counts > 0)[:, None]
        return (jnp.where(alive, newC, rand), inertia / n), None

    keys = jax.random.split(key, iters)
    (C, inertia), _ = jax.lax.scan(step, (C, jnp.asarray(0.0, x.dtype)), keys)
    return C, inertia


def fit_kmeans(x, k: int, *, iters: int = 50, seed: int = 1234,
               init_sample: int = 65536, chunk: int = 8192, n_init: int = 3):
    """Fit k-means on device: kmeans++ seed (on a subsample) + Lloyd iterations.

    The reference fits sklearn MiniBatchKMeans(batch 1024, k-means++,
    reassignment .01) over all mel frames (kmeans_learn.py); Lloyd's on the
    full dataset is strictly higher-quality and maps onto the MXU as a
    GEMM-per-chunk scan. x: (N, D) array-like. Returns (centroids (K, D),
    final mean inertia).
    """
    x = jnp.asarray(x, jnp.float32)
    n, d = x.shape
    # seeding subsample: host-side choice (no-replacement choice on device
    # compiles a full sort over n — ~30s for 200k rows)
    sub = x if n <= init_sample else x[np.random.default_rng(seed).choice(
        n, init_sample, replace=False)]
    chunk = min(chunk, n)
    target = -(-n // chunk) * chunk
    if target != n:
        # weight-0 padding would complicate the segment sums; instead repeat
        # rows modulo n (repeats only bias counts, not the argmin structure)
        x = x[jnp.arange(target) % n]
    # n_init restarts (sklearn-style): keep the lowest-inertia run.
    # Restarts reuse the jit caches, so only the first pays compilation.
    best = (None, np.inf)
    for i in range(n_init):
        kinit, kfit = jax.random.split(jax.random.PRNGKey(seed + i))
        C = _kmeanspp_init(kinit, sub, k)
        C, inertia = _lloyd(kfit, x, C, iters, chunk)
        inertia = float(inertia)
        if inertia < best[1]:
            best = (C, inertia)
    return best


def codebook_diagnostics(C) -> dict:
    """Pairwise codebook statistics (the reference's check_cos_sim
    diagnostics, km_label.py:96-115): cosine-similarity spread and centroid
    norms — high off-diagonal similarity flags a collapsed codebook."""
    C = np.asarray(C, np.float64)
    n = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
    sim = n @ n.T
    off = sim[~np.eye(len(C), dtype=bool)]
    return {
        "k": len(C),
        "cos_sim_mean": float(off.mean()),
        "cos_sim_max": float(off.max()),
        "cos_sim_min": float(off.min()),
        "norm_mean": float(np.linalg.norm(C, axis=1).mean()),
        "norm_std": float(np.linalg.norm(C, axis=1).std()),
    }


@dataclasses.dataclass
class KMeans:
    """Centroid container mirroring ApplyKmeans (rows = centroids)."""
    centroids: jnp.ndarray  # (K, D)

    def __call__(self, x):
        return assign(x, self.centroids)

    def quantize(self, x):
        return quantize_to_centroids(x, self.centroids)

    @property
    def k(self) -> int:
        return self.centroids.shape[0]

    @staticmethod
    def fit(x, k: int, **kw) -> "KMeans":
        C, _ = fit_kmeans(x, k, **kw)
        return KMeans(C)

    @staticmethod
    def load_joblib(path: str) -> "KMeans":
        """Import a reference sklearn MiniBatchKMeans model (joblib .km/.bin)."""
        import joblib
        km = joblib.load(path)
        return KMeans(jnp.asarray(km.cluster_centers_, jnp.float32))

    def save(self, path: str):
        np.save(path, np.asarray(self.centroids))

    @staticmethod
    def load(path: str) -> "KMeans":
        return KMeans(jnp.asarray(np.load(path), jnp.float32))

    @staticmethod
    def load_auto(path: str) -> "KMeans":
        """Dispatch on extension: reference joblib models (.km/.bin) vs
        this framework's .npy centroids — the one format check every CLI
        shares."""
        return (KMeans.load_joblib(path)
                if str(path).endswith((".km", ".bin")) else KMeans.load(path))
