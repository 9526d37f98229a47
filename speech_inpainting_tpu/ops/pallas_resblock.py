"""Pallas TPU kernel: fused HiFi-GAN residual dilated-conv pair.

One MRF residual step is x + conv_k1(lrelu(conv_kd(lrelu(x)))) — in XLA this
is two conv kernels with the intermediate activations round-tripping through
HBM, and at the generator's late stages (C = 32/64, T up to ~90k) the MXU is
lane-starved. This kernel keeps a time tile resident in VMEM (time on the
lane axis), computes both convolutions as K-step shifted (C×C)·(C×TILE)
matmuls, and fuses the leaky-relus, biases, and residual — one HBM read and
one write per element per residual step instead of six.

Halo handling: blocks overlap by the two convs' receptive field, which
BlockSpec can't express (block-index semantics), so the padded input stays
in HBM (memory_space=ANY) and each tile DMAs its halo'd slice into VMEM
scratch explicitly.

Inference fast path (no custom VJP); training uses the XLA path. Numerics
match the ops.conv/leaky_relu composition (tests/test_pallas.py); CPU test
runs use interpret mode.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LRELU_SLOPE = 0.1


def _lrelu(x, slope=LRELU_SLOPE):
    # compare in f32: Mosaic lacks bf16 predication on some targets
    x = x.astype(jnp.float32)
    return jnp.where(x >= 0, x, slope * x)


def _kernel(x_hbm, w1_ref, b1_ref, w2_ref, b2_ref, o_ref, x_slots, h_vmem,
            acc_vmem, sem, *, k: int, dilation: int, tile: int,
            t_total: int, window: int):
    halo1 = dilation * (k - 1) // 2
    halo2 = (k - 1) // 2
    halo = halo1 + halo2
    i = pl.program_id(0)
    j = pl.program_id(1)
    n_tiles = pl.num_programs(1)
    n = i * n_tiles + j
    total = pl.num_programs(0) * n_tiles
    slot = jax.lax.rem(n, 2)

    # double-buffered halo loads: the TPU grid runs sequentially, so slot
    # state persists across steps — start tile n+1's DMA before computing
    # tile n. Mosaic requires 128-aligned HBM slices; `window` is
    # tile+2*halo rounded up, the excess columns are ignored below.
    def dma_for(nn, s):
        ii = jax.lax.div(nn, n_tiles)
        jj = jax.lax.rem(nn, n_tiles)
        return pltpu.make_async_copy(
            x_hbm.at[ii, :, pl.ds(jj * tile, window)],
            x_slots.at[s], sem.at[s])

    @pl.when(n == 0)
    def _():
        dma_for(n, slot).start()

    @pl.when(n + 1 < total)
    def _():
        dma_for(n + 1, jax.lax.rem(n + 1, 2)).start()

    dma_for(n, slot).wait()
    x_vmem = x_slots.at[slot]

    w_mid = tile + 2 * halo2
    h_vmem[:, :] = _lrelu(x_vmem[:, :]).astype(h_vmem.dtype)
    # in-place accumulation on scratch refs keeps Mosaic's stack flat
    # (chained SSA adds blow past the scoped-vmem limit at C >= 64)
    acc_vmem[:, :w_mid] = jnp.dot(w1_ref[:, :, 0], h_vmem[:, 0:w_mid],
                                  preferred_element_type=jnp.float32)
    for jj in range(1, k):
        off = jj * dilation
        acc_vmem[:, :w_mid] += jnp.dot(w1_ref[:, :, jj],
                                       h_vmem[:, off:off + w_mid],
                                       preferred_element_type=jnp.float32)
    h2 = _lrelu(acc_vmem[:, :w_mid] + b1_ref[:, :])
    # the unfused reference zero-pads conv2's INPUT at the signal edges;
    # zero h2 wherever its absolute position falls outside [0, T)
    abs_pos = (j * tile - halo2
               + jax.lax.broadcasted_iota(jnp.int32, h2.shape, 1))
    h_vmem[:, :w_mid] = jnp.where((abs_pos >= 0) & (abs_pos < t_total),
                                  h2, 0.0).astype(h_vmem.dtype)
    acc_vmem[:, :tile] = jnp.dot(w2_ref[:, :, 0], h_vmem[:, 0:tile],
                                 preferred_element_type=jnp.float32)
    for jj in range(1, k):
        acc_vmem[:, :tile] += jnp.dot(w2_ref[:, :, jj],
                                      h_vmem[:, jj:jj + tile],
                                      preferred_element_type=jnp.float32)
    o_ref[0] = (x_vmem[:, halo:halo + tile] + acc_vmem[:, :tile]
                + b2_ref[:, :]).astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("dilation", "tile", "interpret"))
def fused_resblock_step(x, w1, b1, w2, b2, *, dilation: int = 1,
                        tile: int = 2048, interpret: bool = False):
    """x + conv2(lrelu(conv1(lrelu(x)))), torch Conv1d 'same' semantics.

    x: (B, C, T); w1/w2: (C, C, K) torch layout; b1/b2: (C,).
    conv1 has `dilation`, conv2 dilation 1 (HiFi-GAN ResBlock1 pairs,
    I_ea/hifi_gan/models.py:24-60 behavior).
    """
    b, c, t = x.shape
    k = w1.shape[-1]
    halo = dilation * (k - 1) // 2 + (k - 1) // 2
    assert tile % 128 == 0, "tile must be lane-aligned"
    window = -(-(tile + 2 * halo) // 128) * 128
    n_tiles = -(-t // tile)
    t_pad = n_tiles * tile
    dtype = x.dtype if x.dtype in (jnp.float32, jnp.bfloat16) else jnp.float32
    # left pad: halo; right pad: enough that the last tile's aligned
    # window stays in bounds
    right = (n_tiles - 1) * tile + window - (t + halo)
    xp = jnp.pad(x.astype(dtype), ((0, 0), (0, 0), (halo, max(right, 0))))

    out = pl.pallas_call(
        functools.partial(_kernel, k=k, dilation=dilation, tile=tile,
                          t_total=t, window=window),
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),          # x stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, c, tile), lambda i, j: (i, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, c, t_pad), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, c, window), dtype),        # double-buffered x
            pltpu.VMEM((c, window), dtype),           # activations
            pltpu.VMEM((c, window), jnp.float32),     # f32 accumulator
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xp, w1.astype(dtype), b1.reshape(-1, 1).astype(jnp.float32),
      w2.astype(dtype), b2.reshape(-1, 1).astype(jnp.float32))
    return out[:, :, :t]


def resblock1_forward(x, params, kernel_size: int, dilations, *,
                      tile: int = 2048, interpret: bool = False):
    """Full ResBlock1 (3 residual conv pairs) via the fused kernel.

    `params`: the flax ResBlock1 param tree ({convs1_i: {v,g,b},
    convs2_i: {v,g,b}}); weight norm is folded here (inference fold, the
    remove_weight_norm equivalent).
    """
    from .conv import weight_norm_kernel
    for i, d in enumerate(dilations):
        p1 = params[f"convs1_{i}"]
        p2 = params[f"convs2_{i}"]
        w1 = weight_norm_kernel(p1["v"], p1["g"])
        w2 = weight_norm_kernel(p2["v"], p2["g"])
        x = fused_resblock_step(x, w1, p1["b"], w2, p2["b"],
                                dilation=int(d), tile=tile,
                                interpret=interpret)
    return x
