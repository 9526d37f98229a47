"""GEMM-native fundamental-frequency (f0) tracking on TPU.

Functional replacement for the reference's YAAPT usage
(I_da/src/dataset.py:23-63: frame 20 ms, hop 5 ms, NCCF threshold 0.25,
±10 ms zero pad, unvoiced frames = 0), which is pure-Python DSP and the
preprocessing bottleneck (SURVEY.md §3.3). Here the NCCF (normalized
cross-correlation) over all candidate lags is ONE depthwise convolution —
each frame becomes a channel, its first `win` samples the filter — so the
whole utterance's pitch tracking is a single fused XLA graph on device.

Also provides the reference's f0 post-processing: voiced-only z-normalization
(`normalize_nonzero`, dataset.py:330-334) and per-speaker statistics
(scripts/f0_stats.py equivalent).
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


@dataclasses.dataclass(frozen=True)
class F0Config:
    sr: int = 16000
    frame_ms: float = 20.0       # YAAPT frame_length
    hop_ms: float = 5.0          # YAAPT frame_space
    corr_ms: float = 25.0        # correlation window (tda_frame_length)
    fmin: float = 60.0
    fmax: float = 400.0
    nccf_threshold: float = 0.25  # YAAPT nccf_thresh1
    energy_floor: float = 1e-4   # RMS gate relative to utterance peak RMS
    median_width: int = 3        # post smoothing of the lag track

    @property
    def hop(self) -> int:
        return int(self.sr * self.hop_ms / 1000)

    @property
    def win(self) -> int:
        return int(self.sr * self.corr_ms / 1000)

    @property
    def pad(self) -> int:
        return int(self.frame_ms / 1000 * self.sr) // 2

    @property
    def min_lag(self) -> int:
        return max(2, int(self.sr / self.fmax))

    @property
    def max_lag(self) -> int:
        return int(np.ceil(self.sr / self.fmin))

    def num_frames(self, samples: int) -> int:
        total = samples + 2 * self.pad
        flen = self.win + self.max_lag
        return max(0, 1 + (total - flen) // self.hop)


def _frames(x, flen: int, hop: int):
    n = 1 + (x.shape[-1] - flen) // hop
    idx = jnp.arange(flen)[None, :] + hop * jnp.arange(n)[:, None]
    return x[..., idx]                        # (..., n, flen)


def _median(x, width: int):
    if width <= 1:
        return x
    pads = [(0, 0)] * (x.ndim - 1) + [(width // 2, width // 2)]
    xp = jnp.pad(x, pads, mode="edge")
    stack = jnp.stack([xp[..., i:i + x.shape[-1]] for i in range(width)], -1)
    return jnp.median(stack, axis=-1)


@partial(jax.jit, static_argnums=1)
def _track(audio, cfg: F0Config):
    x = jnp.pad(audio.astype(jnp.float32), (cfg.pad, cfg.pad))
    flen = cfg.win + cfg.max_lag
    frames = _frames(x, flen, cfg.hop)                  # (F, flen)
    frames = frames - jnp.mean(frames, axis=-1, keepdims=True)
    F = frames.shape[0]

    # NCCF numerator for every lag in one depthwise conv: input channels are
    # frames, each filtered by its own first `win` samples.
    inp = frames[None]                                  # (1, F, flen)
    kern = frames[:, None, :cfg.win]                    # (F, 1, win)
    num = lax.conv_general_dilated(
        inp, kern, window_strides=(1,), padding=[(0, 0)],
        dimension_numbers=("NCH", "OIH", "NCH"),
        feature_group_count=F,
        precision=lax.Precision.HIGHEST)[0]             # (F, max_lag+1)

    # sliding energies via the same depthwise trick with a ones kernel
    ones = jnp.ones((F, 1, cfg.win), jnp.float32)
    energy = lax.conv_general_dilated(
        (frames * frames)[None], ones, window_strides=(1,),
        padding=[(0, 0)], dimension_numbers=("NCH", "OIH", "NCH"),
        feature_group_count=F,
        precision=lax.Precision.HIGHEST)[0]             # (F, max_lag+1)

    e0 = energy[:, :1]
    nccf = num / jnp.sqrt(jnp.maximum(e0 * energy, 1e-12))

    lags = jnp.arange(cfg.min_lag, cfg.max_lag + 1)
    band = nccf[:, cfg.min_lag:cfg.max_lag + 1]         # (F, L)
    # periodic signals peak at every period multiple; take the SMALLEST lag
    # whose local maximum is within 90% of the global max (octave guard)
    L = band.shape[-1]
    gmax = jnp.max(band, axis=-1, keepdims=True)
    bp = jnp.pad(band, ((0, 0), (1, 1)), constant_values=-jnp.inf)
    local_max = (band >= bp[:, :-2]) & (band >= bp[:, 2:])
    cand = local_max & (band >= 0.9 * gmax)
    best = jnp.argmax(cand.astype(jnp.int32) * (L - jnp.arange(L))[None, :],
                      axis=-1)
    peak = jnp.take_along_axis(band, best[:, None], axis=-1)[:, 0]

    # parabolic interpolation around the peak lag
    li = jnp.clip(best, 1, band.shape[-1] - 2)
    ym = jnp.take_along_axis(band, (li - 1)[:, None], -1)[:, 0]
    y0 = jnp.take_along_axis(band, li[:, None], -1)[:, 0]
    yp = jnp.take_along_axis(band, (li + 1)[:, None], -1)[:, 0]
    denom = ym - 2 * y0 + yp
    delta = jnp.where(jnp.abs(denom) > 1e-9,
                      0.5 * (ym - yp) / jnp.where(denom == 0, 1.0, denom),
                      0.0)
    delta = jnp.clip(delta, -0.5, 0.5)
    lag = lags[best].astype(jnp.float32) + jnp.where(best == li, delta, 0.0)
    lag = _median(lag, cfg.median_width)

    rms = jnp.sqrt(e0[:, 0] / cfg.win)
    voiced = (peak > cfg.nccf_threshold) & \
             (rms > cfg.energy_floor * jnp.max(rms))
    f0 = jnp.where(voiced, cfg.sr / jnp.maximum(lag, 1.0), 0.0)
    return f0


def extract_f0(audio, cfg: F0Config = F0Config()):
    """audio (T,) or (B, T) → f0 (frames,) / (B, frames); 0 = unvoiced."""
    audio = jnp.asarray(audio)
    if audio.ndim == 1:
        return _track(audio, cfg)
    return jax.vmap(lambda a: _track(a, cfg))(audio)


def normalize_nonzero(f0, mean, std, eps: float = 1e-8):
    """(f0 − mean)/std on voiced frames, 0 stays 0 (reference
    normalize_nonzero semantics)."""
    f0 = jnp.asarray(f0)
    return jnp.where(f0 == 0.0, 0.0, (f0 - mean) / jnp.maximum(std, eps))


def f0_statistics(f0_list) -> dict:
    """Voiced-only mean/std across utterances → {'f0_mean', 'f0_std'}
    (the scripts/f0_stats.py per-speaker statistics)."""
    voiced = np.concatenate([np.asarray(f)[np.asarray(f) > 0]
                             for f in f0_list]) if f0_list else np.zeros(0)
    if voiced.size == 0:
        return {"f0_mean": 0.0, "f0_std": 1.0}
    return {"f0_mean": float(voiced.mean()), "f0_std": float(voiced.std())}
