"""EMA vector-quantization bottleneck (flax), SPMD-correct.

Behavior matched to the reference jukebox-style VQ (I_da/src/modules/vq.py:9-265;
code new): EMA (mu) codebook updates from one-hot segment sums, k-means-style
init from the first training batch, random restart of dead codes below a usage
threshold, straight-through estimator, commit loss ‖sg(q)−x‖²/N, and
entropy/usage metrics.

Distributed semantics: the reference syncs via torch.distributed
broadcast/all_reduce with a no-op single-process fallback
(I_da/src/modules/dist.py). Here the same contract comes from SPMD: when
`axis_name` is set (inside shard_map/pmap), `k_sum`/`k_elem` are psum-reduced
over the mesh axis, and restart candidates are taken from axis index 0 via
all_gather — single-device runs need no changes (axis_name=None).

Codebook state lives in the mutable 'vq' collection; pass
`mutable=['vq']` during training steps.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .kmeans import pairwise_sqdist


def _tile_candidates(key, x, k_bins: int):
    """k_bins random rows of x (repeated + jittered if x has too few rows)."""
    n, d = x.shape
    if n < k_bins:
        reps = (k_bins + n - 1) // n
        x = jnp.tile(x, (reps, 1))
        x = x + jax.random.normal(key, x.shape, x.dtype) * (0.01 / jnp.sqrt(d))
        n = x.shape[0]
    perm = jax.random.permutation(jax.random.fold_in(key, 1), n)[:k_bins]
    return x[perm]


class EMAVectorQuantizer(nn.Module):
    """One BottleneckBlock: (N, C, T) → labels, quantized, commit loss, metrics."""
    k_bins: int
    emb_width: int
    mu: float = 0.99
    threshold: float = 1.0
    axis_name: Optional[str] = None

    def setup(self):
        zeros = lambda *shape: lambda: jnp.zeros(shape, jnp.float32)
        self.k = self.variable("vq", "k", zeros(self.k_bins, self.emb_width))
        self.k_sum = self.variable("vq", "k_sum",
                                   zeros(self.k_bins, self.emb_width))
        self.k_elem = self.variable("vq", "k_elem", zeros(self.k_bins))
        self.initted = self.variable(
            "vq", "initted", lambda: jnp.zeros((), jnp.bool_))

    def _preprocess(self, x):
        """NCT → (N*T, C); a 2*emb_width input is summed halves (vq.py:99-106)."""
        x = jnp.swapaxes(x, 1, 2).reshape(-1, x.shape[1])
        if x.shape[-1] == self.emb_width:
            prenorm = jnp.linalg.norm(x - jnp.mean(x)) / jnp.sqrt(x.size)
        elif x.shape[-1] == 2 * self.emb_width:
            x1, x2 = x[..., :self.emb_width], x[..., self.emb_width:]
            prenorm = (jnp.linalg.norm(x1 - jnp.mean(x1)) / jnp.sqrt(x1.size)
                       + jnp.linalg.norm(x2 - jnp.mean(x2)) / jnp.sqrt(x2.size))
            x = x1 + x2
        else:
            raise ValueError(f"width {x.shape[-1]} != (1 or 2)*{self.emb_width}")
        return x, prenorm

    def _psum(self, v):
        if self.axis_name is None:
            return v
        return jax.lax.psum(v, self.axis_name)

    def _bcast_from_zero(self, v):
        """Replicate axis-index-0's value across the mesh axis (the reference's
        rank-0 broadcast of restart candidates, vq.py:39,69)."""
        if self.axis_name is None:
            return v
        return jax.lax.all_gather(v, self.axis_name)[0]

    def quantise(self, x_flat):
        d = pairwise_sqdist(x_flat, self.k.value)
        labels = jnp.argmin(d, axis=-1)
        fit = jnp.mean(jnp.take_along_axis(d, labels[:, None], axis=-1))
        return labels.astype(jnp.int32), fit

    def dequantise(self, labels):
        return jnp.take(self.k.value, labels, axis=0)

    def encode(self, x):
        n, _, t = x.shape
        flat, _ = self._preprocess(x)
        labels, _ = self.quantise(flat)
        return labels.reshape(n, t)

    def decode(self, labels):
        return jnp.swapaxes(self.dequantise(labels), 1, 2)

    def __call__(self, x, *, train: bool = False, update_k: bool = True):
        n, _, t = x.shape
        flat, prenorm = self._preprocess(x)
        updating = train and update_k

        if updating:
            key = self.make_rng("vq")
            cand = self._bcast_from_zero(
                _tile_candidates(key, flat, self.k_bins))
            # first-batch init (vq.py init_k), as a lax.cond on the flag
            init_k, init_sum, init_elem = (
                cand, cand, jnp.ones((self.k_bins,), jnp.float32))
            self.k.value = jnp.where(self.initted.value, self.k.value, init_k)
            self.k_sum.value = jnp.where(self.initted.value,
                                         self.k_sum.value, init_sum)
            self.k_elem.value = jnp.where(self.initted.value,
                                          self.k_elem.value, init_elem)
            self.initted.value = jnp.ones((), jnp.bool_)

        labels, fit = self.quantise(flat)
        x_d = self.dequantise(labels)

        metrics = dict(fit=fit, pn=prenorm)
        if updating:
            one_hot = jax.nn.one_hot(labels, self.k_bins, dtype=jnp.float32)
            _k_sum = self._psum(one_hot.T @ flat)
            _k_elem = self._psum(jnp.sum(one_hot, axis=0))
            old_k = self.k.value
            self.k_sum.value = self.mu * self.k_sum.value + (1 - self.mu) * _k_sum
            self.k_elem.value = self.mu * self.k_elem.value + (1 - self.mu) * _k_elem
            usage = (self.k_elem.value[:, None] >= self.threshold).astype(
                jnp.float32)
            self.k.value = (usage * (self.k_sum.value
                                     / jnp.maximum(self.k_elem.value, 1e-8)[:, None])
                            + (1 - usage) * cand)
            _k_prob = _k_elem / jnp.maximum(jnp.sum(_k_elem), 1e-8)
            metrics.update(
                entropy=-jnp.sum(_k_prob * jnp.log(_k_prob + 1e-8)),
                used_curr=jnp.sum(_k_elem >= self.threshold),
                usage=jnp.sum(usage),
                dk=jnp.linalg.norm(self.k.value - old_k) / jnp.sqrt(old_k.size))

        commit = jnp.sum(jnp.square(jax.lax.stop_gradient(x_d) - flat)) / flat.size
        x_st = flat + jax.lax.stop_gradient(x_d - flat)  # straight-through
        if not train:
            x_st = jax.lax.stop_gradient(x_st)
        x_out = jnp.swapaxes(x_st.reshape(n, t, -1), 1, 2)
        return labels.reshape(n, t), x_out, commit, metrics


class Bottleneck(nn.Module):
    """Multi-level bottleneck (reference Bottleneck, vq.py:189-234)."""
    levels: int
    l_bins: int
    emb_width: int
    mu: float = 0.99
    axis_name: Optional[str] = None

    def setup(self):
        self.level_blocks = [
            EMAVectorQuantizer(self.l_bins, self.emb_width, self.mu,
                               axis_name=self.axis_name,
                               name=f"level_{i}")
            for i in range(self.levels)]

    def encode(self, xs: Sequence[jnp.ndarray]):
        return [b.encode(x) for b, x in zip(self.level_blocks, xs)]

    def decode(self, zs, start_level: int = 0, end_level: Optional[int] = None):
        end = self.levels if end_level is None else end_level
        return [b.decode(z)
                for b, z in zip(self.level_blocks[start_level:end], zs)]

    def __call__(self, xs: Sequence[jnp.ndarray], *, train: bool = False):
        zs, xqs, commits, metrics = [], [], [], []
        for b, x in zip(self.level_blocks, xs):
            z, xq, c, m = b(x, train=train, update_k=train)
            zs.append(z); xqs.append(xq); commits.append(c); metrics.append(m)
        return zs, xqs, commits, metrics
