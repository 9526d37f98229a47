"""GEMM-native STFT for TPU.

Instead of an FFT (which XLA:TPU lowers poorly for the short 1024-point frames
used here), the windowed DFT is expressed as a single strided convolution whose
kernel holds the Hann-windowed cos/sin basis. One `lax.conv_general_dilated`
call = one MXU matmul over all frames; magnitude/mel/log fuse into the
surrounding graph. (See PAPERS.md "MelT: GEMM-native NDFT".)

Matches torch.stft(center=False, onesided=True, normalized=False) numerics used
by the reference frontends:
  - I_ea/hifi_gan/meldataset.py:49-79  (pad (n_fft-hop)/2, hop 256, 22.05 kHz)
  - I_ea/dataset/mel_dump.py:40-98     (pad 312, hop 441, 22.05 kHz)
  - I_da/src/dataset.py:66-139         (pad (n_fft-hop)/2, hop 256, 16 kHz)
"""
from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp
from jax import lax


@functools.lru_cache(maxsize=16)
def _dft_kernel_np(n_fft: int, win_size: int) -> np.ndarray:
    """(2*n_freq, 1, n_fft) conv kernel: rows = [win*cos_k ; win*sin_k]."""
    n_freq = n_fft // 2 + 1
    n = np.arange(n_fft)[None, :]
    k = np.arange(n_freq)[:, None]
    ang = 2.0 * np.pi * k * n / n_fft
    window = np.hanning(win_size + 1)[:-1]  # == torch.hann_window(periodic)
    if win_size < n_fft:  # torch center-pads the window
        pad = (n_fft - win_size) // 2
        window = np.pad(window, (pad, n_fft - win_size - pad))
    basis = np.concatenate([np.cos(ang), -np.sin(ang)], axis=0) * window[None, :]
    return basis[:, None, :].astype(np.float32)


def frame_count(num_samples: int, n_fft: int, hop: int, pad: int) -> int:
    """Number of STFT frames for a signal of `num_samples` after symmetric pad."""
    return 1 + (num_samples + 2 * pad - n_fft) // hop


def stft_magnitude(y, *, n_fft: int, hop: int, win_size: int, pad: int,
                   pad_mode: str = "reflect", eps: float = 1e-9,
                   precision=lax.Precision.HIGHEST):
    """|STFT(y)| as one GEMM. y: (B, T) -> (B, n_freq, frames).

    `pad` is the symmetric reflect padding applied before framing (the reference
    uses (n_fft-hop)//2, except the hop-441 frontend which uses 312).
    Magnitude = sqrt(re^2 + im^2 + eps), matching the reference's +1e-9.
    """
    y = jnp.asarray(y)
    squeeze = y.ndim == 1
    if squeeze:
        y = y[None]
    if pad > 0:
        y = jnp.pad(y, ((0, 0), (pad, pad)), mode=pad_mode)
    kern = jnp.asarray(_dft_kernel_np(n_fft, win_size), dtype=y.dtype)
    # (B, 1, T) conv (2F, 1, n_fft) stride hop -> (B, 2F, frames)
    spec = lax.conv_general_dilated(
        y[:, None, :], kern,
        window_strides=(hop,), padding=[(0, 0)],
        dimension_numbers=("NCH", "OIH", "NCH"),
        precision=precision,
    )
    n_freq = n_fft // 2 + 1
    re, im = spec[:, :n_freq], spec[:, n_freq:]
    mag = jnp.sqrt(re * re + im * im + eps)
    return mag[0] if squeeze else mag


def stft_complex(y, *, n_fft: int, hop: int, win_size: int, pad: int,
                 pad_mode: str = "reflect",
                 precision=lax.Precision.HIGHEST):
    """(re, im) STFT parts, same conventions as `stft_magnitude`."""
    y = jnp.asarray(y)
    squeeze = y.ndim == 1
    if squeeze:
        y = y[None]
    if pad > 0:
        y = jnp.pad(y, ((0, 0), (pad, pad)), mode=pad_mode)
    kern = jnp.asarray(_dft_kernel_np(n_fft, win_size), dtype=y.dtype)
    spec = lax.conv_general_dilated(
        y[:, None, :], kern,
        window_strides=(hop,), padding=[(0, 0)],
        dimension_numbers=("NCH", "OIH", "NCH"),
        precision=precision,
    )
    n_freq = n_fft // 2 + 1
    re, im = spec[:, :n_freq], spec[:, n_freq:]
    if squeeze:
        re, im = re[0], im[0]
    return re, im


@functools.lru_cache(maxsize=16)
def _idft_kernel_np(n_fft: int) -> np.ndarray:
    """(2*n_freq, n_fft) inverse-rDFT basis: time frame = [Re;Im] @ basis.

    x[n] = (1/N)·Σ_k c_k·(Re S_k·cos(2πkn/N) − Im S_k·sin(2πkn/N)),
    c_k = 1 for k ∈ {0, N/2}, else 2 (the conjugate-symmetric half).
    """
    n_freq = n_fft // 2 + 1
    n = np.arange(n_fft)[None, :]
    k = np.arange(n_freq)[:, None]
    ang = 2.0 * np.pi * k * n / n_fft
    c = np.full((n_freq, 1), 2.0)
    c[0] = c[-1] = 1.0
    basis = np.concatenate([c * np.cos(ang), -c * np.sin(ang)]) / n_fft
    return basis.astype(np.float32)


def istft_overlap_add(spec_real, spec_imag, *, n_fft: int, hop: int):
    """Inverse STFT with Hann windowing + overlap-add, torch.istft
    (center=True) semantics: trims n_fft//2 from both ends and normalizes by
    the window-square OLA envelope. GEMM-native (matmul iDFT — no FFT op).

    spec_real/spec_imag: (B, n_fft//2+1, F). Returns (B, (F-1)*hop) samples
    (the torch.istft default-length trim for center=True).

    Requires hop | n_fft (the iSTFTNet head uses n_fft 16 / hop 4, where the
    periodic-Hann² OLA envelope is constant and COLA holds).
    """
    assert n_fft % hop == 0, "hop must divide n_fft for the strided OLA"
    b, n_freq, f = spec_real.shape
    basis = jnp.asarray(_idft_kernel_np(n_fft))
    win = jnp.asarray(np.hanning(n_fft + 1)[:-1].astype(np.float32))
    ri = jnp.concatenate([spec_real, spec_imag], axis=1)    # (B, 2n_freq, F)
    # f32 inputs get true-f32 MXU passes (TPU default is bf16: ~2e-3 err)
    prec = (lax.Precision.HIGHEST if ri.dtype == jnp.float32 else None)
    frames = jnp.einsum("bkf,kn->bfn", ri, basis,
                        precision=prec) * win[None, None, :]
    r = n_fft // hop
    out_len = (f - 1) * hop + n_fft
    out = jnp.zeros((b, out_len), frames.dtype)
    wsq = jnp.zeros((out_len,), jnp.float32)
    w2 = jnp.broadcast_to((win * win)[None, :], (f, n_fft))
    for j in range(r):  # sample (f·hop + j·hop + s) ← frame f, tap j·hop+s
        seg = frames[:, :, j * hop:(j + 1) * hop].reshape(b, f * hop)
        out = out.at[:, j * hop:j * hop + f * hop].add(seg)
        wseg = w2[:, j * hop:(j + 1) * hop].reshape(f * hop)
        wsq = wsq.at[j * hop:j * hop + f * hop].add(wseg)
    half = n_fft // 2
    out = out[:, half:out_len - half]
    wsq = wsq[half:out_len - half]
    return out / jnp.maximum(wsq, 1e-11)[None, :]
