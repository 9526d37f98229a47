"""Mel-spectrogram frontend (slaney filterbank + log dynamic-range compression).

Reproduces the reference's three parameterizations of `mel_spectrogram` exactly
(librosa slaney mel, torch.stft center=False, sqrt(pow+1e-9), log(clamp 1e-5)):
  - vocoder loss/input mel: 22.05 kHz, n_fft 1024, hop 256, win 1024, pad 384
    (I_ea/hifi_gan/meldataset.py:49-79; fmax 8000 or None for `fmax_for_loss`)
  - HuBERT-aligned mel:     22.05 kHz, hop 441 (~20 ms), pad 312
    (I_ea/dataset/mel_dump.py:11-98)
  - I_da loss mel:          16 kHz, hop 256, pad 384 (I_da/src/dataset.py:66-139)

librosa itself is not a dependency: the slaney filterbank is computed here.
"""
from __future__ import annotations

import dataclasses
import functools

import numpy as np
import jax
import jax.numpy as jnp

from .stft import stft_magnitude


def _hz_to_mel_slaney(freq):
    freq = np.asarray(freq, dtype=np.float64)
    f_sp = 200.0 / 3
    mels = freq / f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    log_region = freq >= min_log_hz
    mels = np.where(log_region,
                    min_log_mel + np.log(np.maximum(freq, 1e-10) / min_log_hz) / logstep,
                    mels)
    return mels


def _mel_to_hz_slaney(mels):
    mels = np.asarray(mels, dtype=np.float64)
    f_sp = 200.0 / 3
    freqs = f_sp * mels
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    log_region = mels >= min_log_mel
    return np.where(log_region, min_log_hz * np.exp(logstep * (mels - min_log_mel)),
                    freqs)


@functools.lru_cache(maxsize=16)
def mel_filterbank(sr: int, n_fft: int, n_mels: int, fmin: float,
                   fmax: float | None, htk: bool = False,
                   norm: str | None = "default") -> np.ndarray:
    """Triangular mel filterbank.

    htk=False: librosa.filters.mel defaults (slaney scale + slaney norm) —
    every reference vocoder frontend. htk=True: HTK scale, no norm — the
    torchaudio MelSpectrogram defaults used by the d-vector wav2mel frontend
    (I_da/src/modules/wav2mel.py:143-149). norm overrides that pairing:
    "slaney" forces area normalization, None forces none (librosa's
    mfcc(htk=True) is HTK scale WITH slaney norm — the ASR-baseline DTW
    frontend, predict_asr.py:175).
    Returns (n_mels, 1 + n_fft//2) float32.
    """
    if norm == "default":
        norm = None if htk else "slaney"
    if fmax is None:
        fmax = sr / 2.0
    n_freq = 1 + n_fft // 2
    fftfreqs = np.linspace(0.0, sr / 2.0, n_freq)
    if htk:
        to_mel = lambda f: 2595.0 * np.log10(1.0 + np.asarray(f) / 700.0)
        to_hz = lambda m: 700.0 * (10.0 ** (np.asarray(m) / 2595.0) - 1.0)
    else:
        to_mel, to_hz = _hz_to_mel_slaney, _mel_to_hz_slaney
    mel_pts = to_hz(np.linspace(to_mel(fmin), to_mel(fmax), n_mels + 2))
    fdiff = np.diff(mel_pts)
    ramps = mel_pts[:, None] - fftfreqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1][:, None]
    upper = ramps[2:] / fdiff[1:][:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))
    if norm == "slaney":
        enorm = 2.0 / (mel_pts[2:n_mels + 2] - mel_pts[:n_mels])
        weights *= enorm[:, None]
    return weights.astype(np.float32)


def dynamic_range_compression(x, C: float = 1.0, clip_val: float = 1e-5):
    """log(clamp(x, clip_val) * C) — reference spectral_normalize."""
    return jnp.log(jnp.clip(x, clip_val, None) * C)


def dynamic_range_decompression(x, C: float = 1.0):
    return jnp.exp(x) / C


@dataclasses.dataclass(frozen=True)
class MelConfig:
    """One mel_spectrogram parameterization (static → folds into the jit)."""
    sampling_rate: int = 22050
    n_fft: int = 1024
    num_mels: int = 80
    hop_size: int = 256
    win_size: int = 1024
    fmin: float = 0.0
    fmax: float | None = 8000.0
    pad: int | None = None  # None -> (n_fft - hop)//2

    @property
    def padding(self) -> int:
        return (self.n_fft - self.hop_size) // 2 if self.pad is None else self.pad

    def num_frames(self, num_samples: int) -> int:
        return 1 + (num_samples + 2 * self.padding - self.n_fft) // self.hop_size


# The reference frontends:
VOCODER_MEL_22K = MelConfig()                                     # hop 256 @22.05k
VOCODER_MEL_22K_FULLBAND = MelConfig(fmax=None)                   # fmax_for_loss
HUBERT_ALIGNED_MEL_22K = MelConfig(hop_size=441, pad=312)         # mel_dump.py
# meldataset_modified.py computes its hop-441 mel through the hifi_gan
# mel_spectrogram, whose pad is always (n_fft-hop)//2 = 291 (not 312):
MODIFIED_MEL_22K = MelConfig(hop_size=441)
VOCODER_MEL_16K = MelConfig(sampling_rate=16000)                  # I_da
VOCODER_MEL_16K_FULLBAND = MelConfig(sampling_rate=16000, fmax=None)


def mel_spectrogram(y, cfg: MelConfig = VOCODER_MEL_22K, *, log: bool = True):
    """Log-power mel spectrogram. y: (B, T) or (T,) -> (B, n_mels, frames).

    One GEMM for the windowed DFT + one for the mel projection; everything else
    is elementwise and fuses under jit.
    """
    mag = stft_magnitude(y, n_fft=cfg.n_fft, hop=cfg.hop_size,
                         win_size=cfg.win_size, pad=cfg.padding)
    basis = jnp.asarray(mel_filterbank(cfg.sampling_rate, cfg.n_fft,
                                       cfg.num_mels, cfg.fmin, cfg.fmax),
                        dtype=mag.dtype)
    mel = jnp.einsum("mf,...ft->...mt", basis, mag,
                     precision=jax.lax.Precision.HIGHEST)
    return dynamic_range_compression(mel) if log else mel
