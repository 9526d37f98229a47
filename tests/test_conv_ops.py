"""Golden tests: conv primitives vs torch semantics."""
import numpy as np
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from speech_inpainting_tpu.ops import (avg_pool1d, conv1d, conv2d,
                                       conv_transpose1d, weight_norm_kernel)


def test_conv1d_matches_torch(rng):
    x = rng.standard_normal((2, 8, 50)).astype(np.float32)
    w = rng.standard_normal((16, 8, 7)).astype(np.float32)
    b = rng.standard_normal(16).astype(np.float32)
    ours = np.asarray(conv1d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
                             stride=2, padding=3, dilation=1))
    ref = F.conv1d(torch.from_numpy(x), torch.from_numpy(w),
                   torch.from_numpy(b), stride=2, padding=3).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-5)


def test_conv1d_dilated_grouped(rng):
    x = rng.standard_normal((1, 16, 40)).astype(np.float32)
    w = rng.standard_normal((32, 4, 41)).astype(np.float32)  # groups=4
    ours = np.asarray(conv1d(jnp.asarray(x), jnp.asarray(w), stride=2,
                             padding=20, groups=4))
    ref = F.conv1d(torch.from_numpy(x), torch.from_numpy(w), stride=2,
                   padding=20, groups=4).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=1e-4)


def test_conv1d_dilation(rng):
    x = rng.standard_normal((1, 8, 64)).astype(np.float32)
    w = rng.standard_normal((8, 8, 3)).astype(np.float32)
    ours = np.asarray(conv1d(jnp.asarray(x), jnp.asarray(w), padding=5, dilation=5))
    ref = F.conv1d(torch.from_numpy(x), torch.from_numpy(w), padding=5,
                   dilation=5).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-5)


def test_conv_transpose1d_matches_torch(rng):
    # HiFi-GAN upsample stack shapes: k=16, stride=8, padding=(k-u)//2=4
    x = rng.standard_normal((2, 8, 25)).astype(np.float32)
    w = rng.standard_normal((8, 4, 16)).astype(np.float32)
    b = rng.standard_normal(4).astype(np.float32)
    ours = np.asarray(conv_transpose1d(jnp.asarray(x), jnp.asarray(w),
                                       jnp.asarray(b), stride=8, padding=4))
    ref = F.conv_transpose1d(torch.from_numpy(x), torch.from_numpy(w),
                             torch.from_numpy(b), stride=8, padding=4).numpy()
    assert ours.shape == ref.shape == (2, 4, 25 * 8)
    np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-5)


def test_conv_transpose1d_odd_kernel(rng):
    # I_da upsample: k=11, stride=5, padding=3
    x = rng.standard_normal((1, 6, 20)).astype(np.float32)
    w = rng.standard_normal((6, 3, 11)).astype(np.float32)
    ours = np.asarray(conv_transpose1d(jnp.asarray(x), jnp.asarray(w),
                                       stride=5, padding=3))
    ref = F.conv_transpose1d(torch.from_numpy(x), torch.from_numpy(w),
                             stride=5, padding=3).numpy()
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-5)


def test_conv2d_matches_torch(rng):
    # MPD shape: kernel (5,1), stride (3,1)
    x = rng.standard_normal((2, 1, 30, 11)).astype(np.float32)
    w = rng.standard_normal((32, 1, 5, 1)).astype(np.float32)
    ours = np.asarray(conv2d(jnp.asarray(x), jnp.asarray(w), stride=(3, 1),
                             padding=(2, 0)))
    ref = F.conv2d(torch.from_numpy(x), torch.from_numpy(w), stride=(3, 1),
                   padding=(2, 0)).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-5)


def test_weight_norm_fold_matches_torch(rng):
    w = rng.standard_normal((16, 8, 7)).astype(np.float32)
    conv = torch.nn.Conv1d(8, 16, 7, bias=False)
    with torch.no_grad():
        conv.weight.copy_(torch.from_numpy(w))
    conv = torch.nn.utils.weight_norm(conv)
    g = conv.weight_g.detach().numpy().reshape(-1)
    v = conv.weight_v.detach().numpy()
    ours = np.asarray(weight_norm_kernel(jnp.asarray(v), jnp.asarray(g)))
    np.testing.assert_allclose(ours, conv.weight.detach().numpy(),
                               atol=1e-6, rtol=1e-6)


def test_avg_pool1d_matches_torch(rng):
    x = rng.standard_normal((2, 3, 50)).astype(np.float32)
    ours = np.asarray(avg_pool1d(jnp.asarray(x), 4, 2, 2))
    ref = F.avg_pool1d(torch.from_numpy(x), 4, 2, padding=2).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-6, rtol=1e-6)
