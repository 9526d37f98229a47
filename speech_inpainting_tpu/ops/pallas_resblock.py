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

Two kernels:
  - `fused_resblock_step`: one residual conv pair per pass (round-1 kernel;
    per-tap (C,C)·(C,L) matmuls — contraction only C deep, 1/16 MXU at
    C=32 in bf16, which is why it lost to XLA there).
  - `fused_resblock1`: ALL S residual steps of a ResBlock1 in one VMEM
    residency (trapezoidal stencil fusion: the halo covers the whole
    block's receptive field and each step's output frame shrinks by its
    own halo), with each conv as ONE (C, K·C)·(K·C, L) matmul over an
    in-VMEM im2col — K·C-deep contraction, S× the arithmetic intensity.
    Measured on v5e-1 vs the XLA unfused chain (amortized, T≈50k·B):
      bf16: C32 K3 2.1-2.6×, C32 K11 2.2× (B16) / 0.82× (B64),
            C64 K3/K11 1.2×;  f32: C32 K3 1.12×.
    Hardware numerics: f32 ≤2e-7 rel vs HIGHEST-precision XLA; bf16
    ~5e-3 rel vs XLA's own bf16 chain (both are single-pass MXU).
    Composed into the full generator graph the custom-call boundary
    blocks XLA's cross-block fusion and the net is a loss at serving
    batches (see models/hifigan_fast.py) — serving keeps the XLA path.

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


def _dot(a, b):
    # MXU: f32 operands request true-f32 passes (matches conv1d+HIGHEST
    # numerics, ~1e-6 vs the XLA chain); bf16 operands must use the native
    # single pass (Mosaic rejects fp32 contract_precision on bf16 — "Bad
    # lhs type"), which is also what XLA's bf16 conv does.
    prec = (jax.lax.Precision.HIGHEST if a.dtype == jnp.float32 else None)
    return jnp.dot(a, b, preferred_element_type=jnp.float32, precision=prec)


def _lrelu(x, slope=LRELU_SLOPE):
    # predication-free: for 0 < slope < 1, max(x, slope*x) == leaky_relu(x)
    # (x >= slope*x iff x >= 0). Stays in the input dtype — no f32 upcast,
    # which is what made the round-1 bf16 kernel lose to XLA (bf16 compares
    # forced element-wise upcast/downcast round trips).
    return jnp.maximum(x, slope * x)


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
    acc_vmem[:, :w_mid] = _dot(w1_ref[:, :, 0], h_vmem[:, 0:w_mid])
    for jj in range(1, k):
        off = jj * dilation
        acc_vmem[:, :w_mid] += _dot(w1_ref[:, :, jj], h_vmem[:, off:off + w_mid])
    h2 = _lrelu(acc_vmem[:, :w_mid] + b1_ref[:, :])
    # the unfused reference zero-pads conv2's INPUT at the signal edges;
    # zero h2 wherever its absolute position falls outside [0, T)
    abs_pos = (j * tile - halo2
               + jax.lax.broadcasted_iota(jnp.int32, h2.shape, 1))
    h_vmem[:, :w_mid] = jnp.where((abs_pos >= 0) & (abs_pos < t_total),
                                  h2, 0.0).astype(h_vmem.dtype)
    acc_vmem[:, :tile] = _dot(w2_ref[:, :, 0], h_vmem[:, 0:tile])
    for jj in range(1, k):
        acc_vmem[:, :tile] += _dot(w2_ref[:, :, jj], h_vmem[:, jj:jj + tile])
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


def _kernel_full(x_hbm, w1_ref, b1_ref, w2_ref, b2_ref, o_ref, x_slots,
                 h_vmem, im_vmem, acc_vmem, sem, *, k: int, dilations,
                 tile: int, t_total: int, window: int):
    """All S residual steps of one ResBlock1 in a single VMEM residency.

    Trapezoidal stencil fusion: the tile's halo covers the whole block's
    receptive field (sum of per-step halos H); each step computes over a
    window that shrinks by its own halo, writing the shifted result back
    into the tile buffer. One HBM read + one write per element for 2S convs
    (vs 2 per conv pair in the single-step kernel) — S× the arithmetic
    intensity, which is what bf16 needs (half the bytes, same FLOPs).

    Each conv is ONE (C, K·C)·(K·C, L) matmul over an in-VMEM im2col of the
    K shifted activation rows — per-tap (C, C) matmuls contract only C deep
    (1/4 MXU at C=32) and measured 0.37-0.68× XLA in bf16; the K·C-deep
    contraction is what XLA's own conv lowering does, minus its HBM round
    trips between convs.
    """
    h2c = (k - 1) // 2
    halos = [d * (k - 1) // 2 + h2c for d in dilations]
    H = sum(halos)
    i = pl.program_id(0)
    j = pl.program_id(1)
    n_tiles = pl.num_programs(1)
    n = i * n_tiles + j
    total = pl.num_programs(0) * n_tiles
    slot = jax.lax.rem(n, 2)

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
    cur = x_slots.at[slot]

    # buffer index 0 of `cur` corresponds to absolute sample j*tile - H;
    # each completed step shifts the frame right by its halo.
    c = h_vmem.shape[0]
    base = j * tile - H
    L = window
    off = 0
    for s, d in enumerate(dilations):
        h1 = d * (k - 1) // 2
        L_mid = L - 2 * h1
        L_out = L_mid - 2 * h2c
        h_vmem[:, :L] = _lrelu(cur[:, :L])
        for jj in range(k):
            o = jj * d
            im_vmem[jj * c:(jj + 1) * c, :L_mid] = h_vmem[:, o:o + L_mid]
        acc_vmem[:, :L_mid] = _dot(w1_ref[s], im_vmem[:, :L_mid])
        mid = _lrelu(acc_vmem[:, :L_mid] + b1_ref[s])
        # the unfused chain zero-pads conv2's input at the SIGNAL edges
        pos_mid = (base + off + h1
                   + jax.lax.broadcasted_iota(jnp.int32, mid.shape, 1))
        h_vmem[:, :L_mid] = jnp.where(
            (pos_mid >= 0) & (pos_mid < t_total), mid, 0.0
        ).astype(h_vmem.dtype)
        for jj in range(k):
            im_vmem[jj * c:(jj + 1) * c, :L_out] = h_vmem[:, jj:jj + L_out]
        acc_vmem[:, :L_out] = _dot(w2_ref[s], im_vmem[:, :L_out])
        out = (cur[:, h1 + h2c:h1 + h2c + L_out].astype(jnp.float32)
               + acc_vmem[:, :L_out] + b2_ref[s])
        # zero outside [0, T): the next step's conv1 must see the zero
        # padding the unfused conv1d would apply at the signal edges
        pos_out = (base + off + h1 + h2c
                   + jax.lax.broadcasted_iota(jnp.int32, out.shape, 1))
        # two stores: the shifted in-place form cur[:, :L] = f(cur[:, D:])
        # races under Mosaic's lane scheduling (observed 2e-3 corruption on
        # v5e; interpret mode hides it). Stage in acc (same-index write,
        # safe), then copy across refs.
        acc_vmem[:, :L_out] = jnp.where((pos_out >= 0) & (pos_out < t_total),
                                        out, 0.0)
        cur[:, :L_out] = acc_vmem[:, :L_out].astype(cur.dtype)
        off += h1 + h2c
        L = L_out
    o_ref[0] = cur[:, :tile].astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("dilations", "tile", "interpret"))
def fused_resblock1(x, w1, b1, w2, b2, *, dilations=(1, 3, 5),
                    tile: int = 2048, interpret: bool = False):
    """Full ResBlock1 — S chained `x + conv2(lrelu(conv1(lrelu(x))))` steps
    (I_ea/hifi_gan/models.py:24-60 behavior) — in ONE kernel pass.

    x: (B, C, T); w1/w2: (S, C, C, K) stacked torch-layout kernels (conv1
    of step s has dilation `dilations[s]`, conv2 dilation 1); b1/b2: (S, C).
    """
    b, c, t = x.shape
    s_steps, _, _, k = w1.shape
    assert s_steps == len(dilations)
    h2c = (k - 1) // 2
    halo = sum(d * (k - 1) // 2 + h2c for d in dilations)
    assert tile % 128 == 0, "tile must be lane-aligned"
    window = -(-(tile + 2 * halo) // 128) * 128
    n_tiles = -(-t // tile)
    t_pad = n_tiles * tile
    dtype = x.dtype if x.dtype in (jnp.float32, jnp.bfloat16) else jnp.float32
    right = (n_tiles - 1) * tile + window - (t + halo)
    xp = jnp.pad(x.astype(dtype), ((0, 0), (0, 0), (halo, max(right, 0))))

    out = pl.pallas_call(
        functools.partial(_kernel_full, k=k, dilations=tuple(dilations),
                          tile=tile, t_total=t, window=window),
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
            pltpu.VMEM((k * c, window), dtype),       # im2col rows
            pltpu.VMEM((c, window), jnp.float32),     # f32 accumulator
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xp,
      # (S, C, C, K) -> (S, C, K*C): column block jj holds tap jj, matching
      # the kernel's im2col row blocks
      jnp.concatenate([w1[:, :, :, jj] for jj in range(k)],
                      axis=2).astype(dtype),
      b1[:, :, None].astype(jnp.float32),
      jnp.concatenate([w2[:, :, :, jj] for jj in range(k)],
                      axis=2).astype(dtype),
      b2[:, :, None].astype(jnp.float32))
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
