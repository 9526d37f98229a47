"""Waveform / frame masking as pure jittable ops.

The reference zeroes waveform spans with Python slicing at item-fetch time; here
masks are dynamic-position, static-shape `where` ops so they live inside the
accelerator graph (no host round-trip per utterance).

Index conventions matched exactly:
  - I_ea train masking (16 kHz, HuBERT frame hop 320):
      zero samples [pos*320 + 80, (pos+len)*320 - 1)       (dataset/dataset.py:82)
    predict.py:133 uses the same span written as [pos*320+80 : (pos+len)*320+79-80].
  - I_da inpainting masking: zero [start_sample, start_sample + mask_samples)
    at a fixed 1.5 s start (I_da/scripts/inpainting.py:187-192).
"""
from __future__ import annotations

import jax.numpy as jnp

HUBERT_HOP = 320
HUBERT_EDGE = 80  # half the (400-80) receptive-field margin used by the reference


def mask_span(x, start, length, axis: int = -1, fill_value=0.0):
    """Zero (or fill) x[..., start:start+length] along `axis`.

    `start`/`length` may be traced scalars; shapes stay static.
    """
    axis = axis % x.ndim
    n = x.shape[axis]
    idx = jnp.arange(n)
    m = (idx >= start) & (idx < start + length)
    shape = [1] * x.ndim
    shape[axis] = n
    m = m.reshape(shape)
    return jnp.where(m, jnp.asarray(fill_value, x.dtype), x)


def mask_wave_frames(wave, mask_pos, mask_len_frames):
    """I_ea frame-aligned waveform masking (16 kHz).

    Zeroes samples [mask_pos*320 + 80, (mask_pos + mask_len)*320 - 1), the exact
    convention of the reference's training dataset and predict path.
    wave: (..., T).
    """
    start = mask_pos * HUBERT_HOP + HUBERT_EDGE
    end = (mask_pos + mask_len_frames) * HUBERT_HOP - 1
    return mask_span(wave, start, end - start)


def mask_wave_samples(wave, start_sample, num_samples):
    """Zero an arbitrary sample span (22.05 kHz predict path / I_da path)."""
    return mask_span(wave, start_sample, num_samples)


def frame_mask(num_frames: int, mask_pos, mask_len):
    """Boolean (num_frames,) mask that is True inside [pos, pos+len)."""
    idx = jnp.arange(num_frames)
    return (idx >= mask_pos) & (idx < mask_pos + mask_len)


def splice_frames(base, replacement, mask_pos, mask_len):
    """Replace base[..., pos:pos+len] (last axis = frames) with `replacement`
    frames gathered from the same positions of `replacement`.

    Mirrors the reference's centroid-splice into the masked mel region
    (I_ea/predict.py:184-189). `replacement` must have the same shape as base.
    """
    m = frame_mask(base.shape[-1], mask_pos, mask_len)
    return jnp.where(m, replacement, base)
