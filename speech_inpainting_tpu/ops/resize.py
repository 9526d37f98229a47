"""Bilinear time-axis resize matching torch.nn.functional.interpolate.

The reference regrids the hop-441 (20 ms) mel onto the vocoder's hop-256 grid
with F.interpolate(mode='bilinear', align_corners=False):
  - extend_mel: scale_factor=(1, 441/256)  (I_ea/hifi_gan/inference_modified.py:16-19)
  - meldataset_modified.py:172-173: size=mel.shape[1:]

Because the mel-bin axis is resized with scale 1 (identity), the 2D bilinear
reduces to 1D linear interpolation along frames; we implement that directly as
a static gather + lerp, which XLA folds into the surrounding graph.
"""
from __future__ import annotations

import math

import jax.numpy as jnp


def interp_linear(x, out_len: int, *, scale: float | None = None, axis: int = -1):
    """Linear resample along `axis` with align_corners=False semantics.

    src coordinate for output i is (i + 0.5)/scale - 0.5 with
    scale = out_len/in_len unless an explicit `scale` is given (torch uses the
    user-provided scale_factor directly when one is passed).
    """
    axis = axis % x.ndim
    in_len = x.shape[axis]
    s = (out_len / in_len) if scale is None else scale
    pos = (jnp.arange(out_len, dtype=jnp.float32) + 0.5) / s - 0.5
    pos = jnp.clip(pos, 0.0, in_len - 1)
    lo = jnp.floor(pos).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, in_len - 1)
    w = (pos - lo.astype(jnp.float32)).astype(x.dtype)
    x_lo = jnp.take(x, lo, axis=axis)
    x_hi = jnp.take(x, hi, axis=axis)
    shape = [1] * x.ndim
    shape[axis] = out_len
    w = w.reshape(shape)
    return x_lo * (1 - w) + x_hi * w


def extend_mel(mel, *, src_hop: int = 441, dst_hop: int = 256):
    """Regrid a hop-`src_hop` mel onto the hop-`dst_hop` frame grid.

    mel: (..., n_mels, frames). Output frames = floor(frames * src/dst), the
    torch scale_factor convention of the reference's extend_mel.
    """
    scale = src_hop / dst_hop
    out_len = math.floor(mel.shape[-1] * scale)
    return interp_linear(mel, out_len, scale=scale, axis=-1)


def regrid_mel_to(mel, out_frames: int):
    """Regrid to an explicit frame count (meldataset_modified size= path)."""
    return interp_linear(mel, out_frames, axis=-1)
