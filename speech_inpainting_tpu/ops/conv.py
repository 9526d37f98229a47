"""Torch-semantics convolution primitives on top of jax.lax.

The reference models (HiFi-GAN generator/discriminators, jukebox encoder/decoder,
HuBERT conv frontend) are all expressed in PyTorch Conv1d/ConvTranspose1d/Conv2d
semantics with integer symmetric padding. These helpers reproduce those exact
shape/padding semantics over `lax.conv_general_dilated`, which XLA lowers onto the
MXU. Weights are kept in the torch layout (O, I/groups, K) so checkpoint converters
are identity maps.

Reference behavior being matched (not copied):
  - Conv1d:          I_ea/hifi_gan/models.py, I_da/src/modules/{jukebox,resnet}.py
  - ConvTranspose1d: I_ea/hifi_gan/models.py:97-100 (padding=(k-u)//2)
  - Conv2d (kx1):    I_ea/hifi_gan/models.py:135-147 (DiscriminatorP)
  - weight_norm:     torch.nn.utils.weight_norm with dim=0 (per-output-channel norm)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def conv1d(x, w, b=None, *, stride=1, padding=0, dilation=1, groups=1,
           precision=None):
    """1D convolution with torch semantics.

    Args:
      x: (B, C_in, T)
      w: (C_out, C_in // groups, K)  -- torch layout
      b: optional (C_out,)
      padding: int, symmetric zero padding.
    Returns:
      (B, C_out, T_out)
    """
    out = lax.conv_general_dilated(
        x, w,
        window_strides=(stride,),
        padding=[(padding, padding)],
        rhs_dilation=(dilation,),
        dimension_numbers=("NCH", "OIH", "NCH"),
        feature_group_count=groups,
        precision=precision,
    )
    if b is not None:
        out = out + b[None, :, None]
    return out


def conv_transpose1d(x, w, b=None, *, stride=1, padding=0, dilation=1,
                     groups=1, precision=None):
    """1D transposed convolution with torch semantics.

    Args:
      x: (B, C_in, T)
      w: (C_in, C_out // groups, K) -- torch ConvTranspose1d layout
      b: optional (C_out,)
    Returns:
      (B, C_out, (T-1)*stride - 2*padding + dilation*(K-1) + 1)
    """
    k = w.shape[-1]
    if groups == 1:
        # (C_in, C_out, K) -> flipped (C_out, C_in, K)
        w_t = jnp.flip(jnp.swapaxes(w, 0, 1), axis=-1)
    else:
        c_in, c_out_g, _ = w.shape
        # regroup: (g, C_in/g, C_out/g, K) -> (g, C_out/g, C_in/g, K) -> (C_out, C_in/g, K)
        w_g = w.reshape(groups, c_in // groups, c_out_g, k)
        w_t = jnp.flip(jnp.swapaxes(w_g, 1, 2), axis=-1).reshape(
            groups * c_out_g, c_in // groups, k)
    pad = dilation * (k - 1) - padding
    out = lax.conv_general_dilated(
        x, w_t,
        window_strides=(1,),
        padding=[(pad, pad)],
        lhs_dilation=(stride,),
        rhs_dilation=(dilation,),
        dimension_numbers=("NCH", "OIH", "NCH"),
        feature_group_count=groups,
        precision=precision,
    )
    if b is not None:
        out = out + b[None, :, None]
    return out


def conv2d(x, w, b=None, *, stride=(1, 1), padding=(0, 0), dilation=(1, 1),
           groups=1, precision=None):
    """2D convolution with torch semantics.

    Args:
      x: (B, C_in, H, W)
      w: (C_out, C_in // groups, KH, KW)
    """
    out = lax.conv_general_dilated(
        x, w,
        window_strides=tuple(stride),
        padding=[(padding[0], padding[0]), (padding[1], padding[1])],
        rhs_dilation=tuple(dilation),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=groups,
        precision=precision,
    )
    if b is not None:
        out = out + b[None, :, None, None]
    return out


def weight_norm_kernel(v, g, eps=0.0):
    """Fold weight-norm params into a dense kernel: w = g * v / ||v||.

    Norm is taken over all axes except axis 0 (torch weight_norm dim=0).
    v: (O, ...) direction tensor, g: (O,) magnitude.
    """
    norm = jnp.sqrt(jnp.sum(jnp.square(v.astype(jnp.float32)),
                            axis=tuple(range(1, v.ndim)), keepdims=True) + eps)
    shape = (-1,) + (1,) * (v.ndim - 1)
    return (g.reshape(shape) * (v / norm.astype(v.dtype))).astype(v.dtype)


def weight_norm_kernel_tr(v, g, eps=0.0):
    """weight-norm fold for ConvTranspose1d layout (I, O, K): torch dim=0 norms
    over axes (1, 2) still -- torch's weight_norm defaults to dim=0 regardless of
    the conv being transposed, so the 'output' axis for normalization purposes is
    axis 0 = C_in. We reproduce that exactly.
    """
    return weight_norm_kernel(v, g, eps)


def avg_pool1d(x, kernel, stride, padding):
    """torch.nn.AvgPool1d semantics (count_include_pad=True).

    x: (B, C, T) -> (B, C, floor((T + 2p - k)/s) + 1)
    """
    summed = lax.reduce_window(
        x, 0.0, lax.add,
        window_dimensions=(1, 1, kernel),
        window_strides=(1, 1, stride),
        padding=((0, 0), (0, 0), (padding, padding)),
    )
    return summed / kernel


def get_padding(kernel_size, dilation=1):
    """'same'-length padding for odd kernels (reference utils.get_padding)."""
    return (kernel_size * dilation - dilation) // 2
