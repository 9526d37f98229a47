"""Losses: LSGAN + feature-matching + mel-L1, and I_ea centroid losses.

Behavior matched to the reference (code new):
  - GAN losses: I_ea/hifi_gan/models.py:258-289 (LSGAN; feature loss x2;
    mel-L1 x45 applied in the training loops)
  - Centroid losses: I_ea/loss_fn.py:6-101 (centered cosine-similarity loss,
    MSE-to-centroid, soft CE, pairwise codebook similarity targets tau=0.1)

All functions are pure and jit-friendly; sums/means reduce over static shapes.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


# ----------------------------------------------------------------------------
# GAN losses (LSGAN)
# ----------------------------------------------------------------------------

def feature_loss(fmap_r, fmap_g):
    """L1 feature-matching over all discriminator feature maps, x2.

    Reductions run in f32 even when the discriminators compute in bf16
    (GANConfig.disc_bf16) — a no-op for f32 inputs.
    """
    loss = 0.0
    for dr, dg in zip(fmap_r, fmap_g):
        for rl, gl in zip(dr, dg):
            loss += jnp.mean(jnp.abs(rl.astype(jnp.float32)
                                     - gl.astype(jnp.float32)))
    return loss * 2.0


def discriminator_loss(disc_real_outputs, disc_generated_outputs):
    """Σ mean((1-D(y))²) + mean(D(ŷ)²); also returns per-D terms."""
    loss = 0.0
    r_losses, g_losses = [], []
    for dr, dg in zip(disc_real_outputs, disc_generated_outputs):
        r_loss = jnp.mean(jnp.square(1.0 - dr.astype(jnp.float32)))
        g_loss = jnp.mean(jnp.square(dg.astype(jnp.float32)))
        loss += r_loss + g_loss
        r_losses.append(r_loss)
        g_losses.append(g_loss)
    return loss, r_losses, g_losses


def generator_loss(disc_outputs):
    """Σ mean((1-D(ŷ))²)."""
    loss = 0.0
    gen_losses = []
    for dg in disc_outputs:
        l = jnp.mean(jnp.square(1.0 - dg.astype(jnp.float32)))
        gen_losses.append(l)
        loss += l
    return loss, gen_losses


def mel_l1_loss(mel_real, mel_gen, weight: float = 45.0):
    """Reference mel-spectrogram L1, scaled x45 in the training loops."""
    return weight * jnp.mean(jnp.abs(mel_real - mel_gen))


# ----------------------------------------------------------------------------
# I_ea centroid losses
# ----------------------------------------------------------------------------

class CentroidLosses:
    """Losses against a k-means codebook of mel frames.

    `centroids`: (K, D) codebook (rows are centroids; note the reference keeps
    C as (D, K) — we keep (K, D) and transpose at the converter boundary).
    """

    def __init__(self, centroids, tau: float = 0.1):
        self.C = jnp.asarray(centroids, dtype=jnp.float32)        # (K, D)
        self.center = self.C.mean(axis=0)                         # (D,)
        self.C_centered = self.C - self.center[None, :]           # (K, D)
        self.tau = tau

    def compute_targets(self):
        """Diagonal softmax mass of pairwise centered-codebook cos-sim."""
        cn = self.C_centered / (
            jnp.linalg.norm(self.C_centered, axis=-1, keepdims=True) + 1e-8)
        sim = cn @ cn.T
        e = jnp.exp(sim / self.tau)
        return jnp.diagonal(e) / jnp.sum(e, axis=-1)

    @staticmethod
    def _cos(a, b, eps: float = 1e-8):
        num = jnp.sum(a * b, axis=-1)
        den = jnp.linalg.norm(a, axis=-1) * jnp.linalg.norm(b, axis=-1)
        return num / jnp.maximum(den, eps)

    def cos_sim(self, output, labels):
        """Centered cosine loss −Σ(cos−1) + argmax predicted labels.

        output: (B, T, D) frame embeddings; labels: (B, T) int centroid ids.
        """
        flat = output.reshape(-1, output.shape[-1])
        tgt = self.C_centered[labels.reshape(-1)]
        loss = -jnp.sum(self._cos(flat, tgt) - 1.0)
        sims = self._cos(flat[:, None, :], self.C_centered[None, :, :])
        pred = jnp.argmax(sims, axis=1).reshape(labels.shape)
        return loss, pred

    def mse(self, output, labels):
        """Sum-MSE against *uncentered* centroids + argmin-distance labels."""
        flat = output.reshape(-1, output.shape[-1])
        tgt = self.C[labels.reshape(-1)]
        loss = jnp.sum(jnp.square(flat - tgt))
        d = (jnp.sum(flat ** 2, -1, keepdims=True)
             - 2.0 * flat @ self.C.T + jnp.sum(self.C ** 2, -1)[None, :])
        pred = jnp.argmin(d, axis=-1).reshape(labels.shape)
        return loss, pred

    def soft_ce(self, logits, labels):
        """Sum cross-entropy over (B, T, K) logits + argmax labels."""
        flat = logits.reshape(-1, logits.shape[-1])
        lbl = labels.reshape(-1).astype(jnp.int32)
        logp = jax.nn.log_softmax(flat, axis=-1)
        loss = -jnp.sum(jnp.take_along_axis(logp, lbl[:, None], axis=-1))
        pred = jnp.argmax(flat, axis=-1).reshape(labels.shape)
        return loss, pred

    def cos_sim_pred_target(self, pred_labels, labels):
        """Cosine sim between predicted and target centered centroids
        (the reference's cos-sim-accuracy metric, thresholded at 0.95)."""
        a = self.C_centered[pred_labels.reshape(-1)]
        b = self.C_centered[labels.reshape(-1)]
        return self._cos(a, b)


# ----------------------------------------------------------------------------
# VQ-VAE losses
# ----------------------------------------------------------------------------

def commit_loss(x, x_q):
    """‖sg(q) − x‖² / N (reference vq.py forward commit term)."""
    return jnp.sum(jnp.square(jax.lax.stop_gradient(x_q) - x)) / x.size
