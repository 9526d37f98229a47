"""Informed speech inpainting: the I_ea flagship inference graph, fully jitted.

Re-designs the reference predict path (I_ea/predict.py:58-207) as ONE
accelerator graph — wav in, wav out, no per-utterance host round-trips:

    wav22 ─ mask ─ normalize·0.95 ─ mel(hop441) ───────────────┐ splice ─ extend ─ HiFi-GAN ─ wav
    wav16 ─ mask ─ zero-mean/unit-var ─ HuBERT+head ─ nearest centroid ┘

Reference conventions matched:
  - 22.05 kHz mask span [pos·441, (pos+len)·441)  (predict.py:99-104;
    320·22050/16000 = 441 exactly)
  - 16 kHz mask span [pos·320+80, (pos+len)·320−1) (predict.py:133)
  - inf-norm ×0.95 on the masked 22k wave (librosa normalize, predict.py:104)
  - HF AutoProcessor zero-mean/unit-var on the 16k wave (predict.py:136-141,
    hubert-large-ls960-ft do_normalize=True)
  - predicted mel frames = centered centroid[argmax cos] + codebook mean
    (predict.py:184-189), spliced over [pos, pos+len) mel frames
  - bilinear 441→256 regrid (extend_mel) before the generator

`mask_pos`/`mask_len` are traced scalars: any mask position/length reuses one
compiled graph (frame grid of hop-441 mel == HuBERT 20 ms frame grid).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from ..models.hifigan import Generator, HiFiGANConfig
from ..models.hubert import EncoderWithHead, HubertConfig
from ..ops.masking import frame_mask, mask_span, mask_wave_frames
from ..ops.mel import HUBERT_ALIGNED_MEL_22K, mel_spectrogram
from ..ops.resize import extend_mel


def peak_normalize(x, level: float = 0.95, eps: float = 1e-10):
    """librosa.util.normalize(x) * level (inf-norm)."""
    return x * (level / jnp.maximum(jnp.max(jnp.abs(x), axis=-1,
                                            keepdims=True), eps))


def meanvar_normalize(x, eps: float = 1e-7):
    """HF Wav2Vec2FeatureExtractor do_normalize: (x−μ)/√(σ²+1e-7)."""
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) / jnp.sqrt(var + eps)


@dataclasses.dataclass(frozen=True)
class InpainterConfig:
    hubert: HubertConfig
    hifigan: HiFiGANConfig
    normalize_16k: bool = True  # HF processor do_normalize


class InformedInpainter:
    """Jit-compiled informed inpainting. Construct once, call per utterance.

    centroids: (K, 80) mel codebook (uncentered; centering follows the
    reference LossFunction). Shapes are static per (len(wav22), len(wav16))
    pair — pad/bucket upstream for batch sweeps.
    """

    def __init__(self, cfg: InpainterConfig, hubert_params, generator_params,
                 centroids):
        self.cfg = cfg
        self._hubert = EncoderWithHead(cfg.hubert, out_dim=centroids.shape[-1])
        self._gen = Generator(cfg.hifigan)
        self._hubert_params = hubert_params
        self._gen_params = generator_params
        C = jnp.asarray(centroids, jnp.float32)
        self._center = C.mean(axis=0)
        self._C_centered = C - self._center[None, :]

    @partial(jax.jit, static_argnums=0)
    def _graph(self, wav22, wav16, mask_pos, mask_len):
        """Batched graph: wav22 (B,T22), wav16 (B,T16), mask_pos/len (B,)."""
        cfg = self.cfg
        # --- 22 kHz branch: masked mel for the vocoder -----------------
        masked22 = jax.vmap(mask_span)(wav22, mask_pos * 441, mask_len * 441)
        masked22 = peak_normalize(masked22)
        mel = mel_spectrogram(masked22, HUBERT_ALIGNED_MEL_22K)  # (B,80,F)
        n_frames = mel.shape[-1]

        # --- 16 kHz branch: HuBERT prediction of masked frames ---------
        masked16 = jax.vmap(mask_wave_frames)(wav16, mask_pos, mask_len)
        if cfg.normalize_16k:
            masked16 = meanvar_normalize(masked16)
        emb = self._hubert.apply({"params": self._hubert_params},
                                 masked16)                    # (B, T, 80)

        # nearest centroid by centered cosine sim (LossFunction.cos_sim)
        en = emb / jnp.maximum(
            jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-8)
        cn = self._C_centered / jnp.maximum(
            jnp.linalg.norm(self._C_centered, axis=-1, keepdims=True), 1e-8)
        pred_labels = jnp.argmax(en @ cn.T, axis=-1)          # (B, T)
        pred_mels = self._C_centered[pred_labels] + self._center  # (B, T, 80)

        # --- splice predictions over the masked mel frames -------------
        # HuBERT frame count can differ from the hop-441 frame count by edge
        # effects; align by padding/truncating predictions to n_frames.
        t = pred_mels.shape[1]
        if t < n_frames:
            pred_mels = jnp.pad(pred_mels, ((0, 0), (0, n_frames - t), (0, 0)))
        else:
            pred_mels = pred_mels[:, :n_frames]
        m = jax.vmap(frame_mask, in_axes=(None, 0, 0))(
            n_frames, mask_pos, mask_len)                      # (B, F)
        inpainted_mel = jnp.where(m[:, None, :],
                                  jnp.swapaxes(pred_mels, 1, 2), mel)

        # --- vocoder ----------------------------------------------------
        feats = extend_mel(inpainted_mel)
        wav = self._gen.apply({"params": self._gen_params}, feats)
        return dict(inpainted=wav[:, 0], mel_masked=mel,
                    mel_inpainted=inpainted_mel, pred_labels=pred_labels)

    @partial(jax.jit, static_argnums=0)
    def _hifi_masked(self, wav22, mask_pos, mask_len):
        """Reference 'hifi_masked.wav': vocode the masked mel as-is."""
        masked22 = peak_normalize(mask_span(wav22, mask_pos * 441,
                                            mask_len * 441))
        mel = mel_spectrogram(masked22[None], HUBERT_ALIGNED_MEL_22K)
        wav = self._gen.apply({"params": self._gen_params}, extend_mel(mel))
        return wav[0, 0]

    def hifi_masked(self, wav22, mask_pos, mask_len):
        return self._hifi_masked(jnp.asarray(wav22, jnp.float32),
                                 jnp.asarray(mask_pos, jnp.int32),
                                 jnp.asarray(mask_len, jnp.int32))

    def __call__(self, wav22, wav16, mask_pos, mask_len):
        """Single utterance: wav22 (T22,), wav16 (T16,) float32;
        mask_pos/mask_len in 20 ms frames. Returns dict of device arrays."""
        out = self._graph(jnp.asarray(wav22, jnp.float32)[None],
                          jnp.asarray(wav16, jnp.float32)[None],
                          jnp.asarray(mask_pos, jnp.int32)[None],
                          jnp.asarray(mask_len, jnp.int32)[None])
        return jax.tree_util.tree_map(lambda x: x[0], out)

    def batch(self, wav22, wav16, mask_pos, mask_len):
        """Batched: wav22 (B,T22), wav16 (B,T16), mask_pos/len (B,)."""
        return self._graph(jnp.asarray(wav22, jnp.float32),
                           jnp.asarray(wav16, jnp.float32),
                           jnp.asarray(mask_pos, jnp.int32),
                           jnp.asarray(mask_len, jnp.int32))

    def expected_inpaint(self, wav22, target_labels, mask_pos, mask_len):
        """Reference 'expected_inpaint': splice the TRUE centroid frames
        (predict.py:175-189) — the decoder-only upper bound."""
        return self._expected(jnp.asarray(wav22, jnp.float32),
                              jnp.asarray(target_labels, jnp.int32),
                              jnp.asarray(mask_pos, jnp.int32),
                              jnp.asarray(mask_len, jnp.int32))

    @partial(jax.jit, static_argnums=0)
    def _expected(self, wav22, labels, mask_pos, mask_len):
        masked22 = peak_normalize(mask_span(wav22, mask_pos * 441,
                                            mask_len * 441))
        mel = mel_spectrogram(masked22[None], HUBERT_ALIGNED_MEL_22K)
        n_frames = mel.shape[-1]
        lab = labels[:n_frames]
        exp_mels = self._C_centered[lab] + self._center
        if exp_mels.shape[0] < n_frames:
            exp_mels = jnp.pad(
                exp_mels, ((0, n_frames - exp_mels.shape[0]), (0, 0)))
        m = frame_mask(n_frames, mask_pos, mask_len)
        exp_mel = jnp.where(m[None, None, :], exp_mels.T[None], mel)
        wav = self._gen.apply({"params": self._gen_params}, extend_mel(exp_mel))
        return dict(expected_inpaint=wav[0, 0], mel_expected=exp_mel[0])
