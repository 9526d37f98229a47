"""Training benchmark: steps/s + audio-sec/s/chip at reference scale.

Two workloads (VERDICT r1 #5), timed steady-state on the default device:
  (a) HiFi-GAN V1 vanilla GAN step — segment 8192, batch 16
      (I_ea/hifi_gan/config_v1.json:2,17: batch_size 16, segment_size 8192)
  (b) I_ea encoder-adaptation step — HuBERT-base, batch 16, 5 s @16 kHz
      (I_ea/config.yaml batch_size 16, max_wav_length 5.0)

Prints one JSON line per workload. Run with --cache to enable the persistent
XLA compilation cache (pays the multi-minute GAN compile once per machine);
compile wall time is reported so before/after is visible.

Usage: python bench_train.py [--cache] [--workload gan|ea|all] [--bf16]
"""
import argparse
import json
import time

import numpy as np


# v5e-1 peaks for the roofline floors (same constants CLAUDE.md's serving
# analysis uses): 197 TF/s bf16, ~98 TF/s f32 MXU, 819 GB/s HBM
PEAK_FLOPS = {"bf16": 197e12, "f32": 98e12}
PEAK_HBM = 819e9


def roofline_floors(compiled, flops_key, pipe, best):
    """Whole-step XLA cost analysis -> compute/memory floors (the same
    accounting CLAUDE.md records for the serving graph; VERDICT r2 #3).
    Takes the AOT-compiled executable the bench already stepped with, so
    the analysis truly reuses the one compile (jit.lower().compile() does
    NOT hit the jit's executable cache — it recompiles, ~9-30 min for the
    GAN step on this tunnel without the persistent cache).
    `flops_key` picks the MXU peak for the compute floor — it must be
    "bf16" whenever ANY matmul/conv in the step runs bf16 (e.g. f32
    params + disc_bf16): floors are LOWER bounds, and dividing
    bf16-executed flops by the f32 peak would overstate the floor and
    inflate pct_of_roofline."""
    cost = compiled.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0] if cost else {}
    flops = float(cost.get("flops", 0.0))
    byts = float(cost.get("bytes accessed", 0.0))
    floor_c = flops / PEAK_FLOPS[flops_key]
    floor_m = byts / PEAK_HBM
    return {
        "tflops_per_step": round(flops / 1e12, 3),
        "gbytes_per_step": round(byts / 1e9, 2),
        "compute_floor_ms": round(floor_c * 1e3, 2),
        "memory_floor_ms": round(floor_m * 1e3, 2),
        "measured_ms": round(pipe * 1e3, 2),
        "measured_ms_synced": round(best * 1e3, 2),
        "pct_of_roofline": round(100 * max(floor_c, floor_m) / pipe, 1),
        "achieved_tflops_per_sec": round(flops / pipe / 1e12, 2),
    }


def pipelined_step_time(run_window, fallback_s, n1: int = 5, n2: int = 35):
    """Per-step time by loop-count differencing (utils.timing
    differenced_time: the tunnel's constant dispatch+readback cost cancels,
    so the recorded number can't inherit a phantom regression from tunnel
    load). Falls back to the per-step-synced measurement — never divides a
    noise-clamped delta — returning (seconds, differenced?)."""
    from speech_inpainting_tpu.utils.timing import differenced_or_fallback
    return differenced_or_fallback(run_window, fallback_s, n1=n1, n2=n2)


def bench_gan(dtype, iters: int = 5, *, batched_disc: bool = False,
              folded_mpd: bool = False, disc_bf16: bool = False,
              roofline: bool = False, family: str = "v1"):
    import jax
    import jax.numpy as jnp
    from speech_inpainting_tpu.models.hifigan import (
        Generator, HiFiGANConfig, MultiPeriodDiscriminator,
        MultiScaleDiscriminator)
    from speech_inpainting_tpu.train.hifigan import (HiFiGANTrainConfig,
                                                     make_vanilla_step)
    from speech_inpainting_tpu.train.gan import GANConfig, create_gan_state
    from speech_inpainting_tpu.ops.mel import VOCODER_MEL_22K
    from speech_inpainting_tpu.utils.timing import force

    B, SEG = 16, 8192
    gcfg = HiFiGANConfig(dtype=dtype)   # V1: up [8,8,2,2], ch 512, k {3,7,11}
    cfg = HiFiGANTrainConfig(
        gan=GANConfig(batched_disc=batched_disc, folded_mpd=folded_mpd,
                      disc_bf16=disc_bf16),
        hifigan=gcfg, segment_size=SEG)
    if family == "istft":
        # the in-framework fast family at full width (iSTFTNet C8C8I):
        # identical recipe/losses, iSTFT head instead of the x4 tail
        from speech_inpainting_tpu.models.hifigan_istft import (
            ISTFTGenerator, ISTFTGeneratorConfig)
        gen = ISTFTGenerator(ISTFTGeneratorConfig(dtype=dtype))
    else:
        gen = Generator(gcfg)
    rng = np.random.default_rng(0)
    gp = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, 80, 8)))["params"]
    y = jnp.asarray((rng.standard_normal((B, 1, SEG)) * 0.2), jnp.float32)
    zy = jnp.zeros((1, 1, SEG))
    mpd, msd = MultiPeriodDiscriminator(), MultiScaleDiscriminator()
    dp = mpd.init(jax.random.PRNGKey(1), zy, zy)["params"]
    sv = msd.init(jax.random.PRNGKey(2), zy, zy, True)
    state = create_gan_state(cfg.gan, gp, dp, sv["params"], sv["spectral"])
    batch = {"audio": y}
    t0 = time.perf_counter()
    # AOT-compile once; the same executable serves stepping AND the
    # roofline cost analysis (no hidden second compile)
    jstep = jax.jit(make_vanilla_step(
        cfg, generator=gen if family == "istft" else None)).lower(
            state, batch).compile()
    state, m = jstep(state, batch)
    force(m)
    compile_s = time.perf_counter() - t0
    best = np.inf
    for _ in range(iters):
        t0 = time.perf_counter()
        state, m = jstep(state, batch)
        force(m)
        best = min(best, time.perf_counter() - t0)
    # pipelined throughput — the number a real training loop sees: loops
    # sync only at logging intervals (train/run.py logs every N steps), so
    # back-to-back dispatches overlap the tunnel round-trip that the synced
    # measurement above pays on every step. This is the PRIMARY metric;
    # the synced one is kept for cross-round comparability. Measured by
    # loop-count differencing (pipelined_step_time) so the tunnel's constant
    # costs cancel.
    def window(n):
        nonlocal state
        t0 = time.perf_counter()
        m = None
        for _ in range(n):
            state, m = jstep(state, batch)
        force(m)
        return time.perf_counter() - t0

    pipe, differenced = pipelined_step_time(window, best)
    sps = 1.0 / pipe
    audio_sps = sps * B * SEG / 22050.0
    key = "bf16" if dtype != jnp.float32 else "f32"
    out = {
        "metric": f"hifigan_{family}_gan_train_step",
        "value": round(sps, 3),
        "unit": f"steps/sec pipelined (B16 x seg8192, {key}"
                f"{', batched-disc' if batched_disc else ''}"
                f"{', folded-mpd' if folded_mpd else ''}"
                f"{', bf16-disc' if disc_bf16 else ''})",
        "steps_per_sec_synced": round(1.0 / best, 3),
        "differenced": differenced,
        "audio_sec_per_sec_per_chip": round(audio_sps, 2),
        "compile_seconds": round(compile_s, 1),
    }
    if roofline:
        flops_key = "bf16" if (key == "bf16" or disc_bf16) else "f32"
        out["roofline"] = roofline_floors(jstep, flops_key,
                                          pipe, best)
    print(json.dumps(out))
    return out


def bench_scan(family: str = "istft", chunk: int = 100, windows=(2, 6)):
    """The chunked-scan training dispatch the eval chain actually ships
    (examples/eval_e2e.py:_chunked_train — K GAN steps inside ONE jitted
    lax.scan, amortizing the tunnel's per-dispatch floor K-fold): measured
    at the chain's own proxy width (192) and recipe (modified decoder
    fine-tune, segment 44288, batch 4, bf16 discs), by timing two window
    sizes of whole chunks and differencing (VERDICT r4 #6: BENCH_TRAIN must
    measure what ships). The V1 family is capped at chunk 25 — the libtpu
    scan-fault guard (CLAUDE.md gotchas, commit e9ed692)."""
    import importlib.util
    from pathlib import Path

    import jax
    import jax.numpy as jnp
    from speech_inpainting_tpu.models.hifigan import (
        Generator, MultiPeriodDiscriminator, MultiScaleDiscriminator)
    from speech_inpainting_tpu.models.hifigan_istft import ISTFTGenerator
    from speech_inpainting_tpu.train.gan import GANConfig, create_gan_state
    from speech_inpainting_tpu.train.hifigan import (HiFiGANTrainConfig,
                                                     make_modified_step)
    from speech_inpainting_tpu.utils.timing import force

    spec = importlib.util.spec_from_file_location(
        "eval_e2e", Path(__file__).resolve().parent / "examples/eval_e2e.py")
    ev = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ev)
    if family == "v1":
        chunk = min(chunk, 25)          # libtpu scan-fault cap
    rng = np.random.default_rng(0)
    centroids = rng.standard_normal((100, 80)).astype(np.float32)
    gen = (ISTFTGenerator(ev.small_istft_22k()) if family == "istft"
           else Generator(ev.small_hifigan_22k()))
    seg, B, mask_len = 44288, 4, 20
    tcfg = HiFiGANTrainConfig(
        gan=GANConfig(steps_per_epoch=1000, batched_disc=True,
                      disc_bf16=True),
        hifigan=ev.small_hifigan_22k(), segment_size=seg, mask_len=mask_len)
    gp = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, 80, 8)))["params"]
    zy = jnp.zeros((1, 1, seg))
    mpd, msd = MultiPeriodDiscriminator(), MultiScaleDiscriminator()
    dp = mpd.init(jax.random.PRNGKey(1), zy, zy)["params"]
    sv = msd.init(jax.random.PRNGKey(2), zy, zy, True)
    state = create_gan_state(tcfg.gan, gp, dp, sv["params"], sv["spectral"])
    step = make_modified_step(tcfg, centroids, generator=gen)
    n441 = tcfg.mel_441.num_frames(seg)
    catd = jnp.asarray(rng.standard_normal(seg * 40).astype(np.float32) * .2)

    def step_ix(s, b, catd):
        audio = jax.vmap(lambda st: jax.lax.dynamic_slice(
            catd, (st,), (seg,)))(b["starts"])[:, None, :]
        return step(s, {"audio": audio, "mask_start": b["mask_start"]})

    @jax.jit
    def multi(s, bs, cs):
        s, ms = jax.lax.scan(lambda s, b: step_ix(s, b, cs), s, bs)
        return s, jax.tree_util.tree_map(lambda x: x[-1], ms)

    def batches(k):
        return {"starts": jnp.asarray(rng.integers(
                    0, seg * 39, (k, B)).astype(np.int32)),
                "mask_start": jnp.asarray(rng.integers(
                    0, n441 - mask_len, (k, B)).astype(np.int32))}

    bs = batches(chunk)
    t0 = time.perf_counter()
    state, m = multi(state, bs, catd)
    force(m)
    compile_s = time.perf_counter() - t0

    def window(n_chunks):
        nonlocal state
        t0 = time.perf_counter()
        m = None
        for _ in range(n_chunks):
            state, m = multi(state, bs, catd)
        force(m)
        return time.perf_counter() - t0

    t_small = window(windows[0])
    t_big = window(windows[1])
    per_chunk = (t_big - t_small) / (windows[1] - windows[0])
    differenced = per_chunk > 0 and t_big > t_small * 1.2
    if not differenced:                       # congestion clamp: fall back
        per_chunk = t_big / windows[1]
    sps = chunk / per_chunk
    out = {
        "metric": f"chunked_scan_train_dispatch_{family}",
        "value": round(sps, 2),
        "unit": f"steps/sec amortized (proxy width 192, modified-decoder "
                f"recipe, B{B} x seg{seg}, bf16 discs, scan chunk {chunk})",
        "differenced": differenced,
        "seconds_per_chunk": round(per_chunk, 3),
        "compile_seconds": round(compile_s, 1),
    }
    print(json.dumps(out))
    return out


def bench_ea(dtype, iters: int = 5, roofline: bool = False):
    import jax
    import jax.numpy as jnp
    from speech_inpainting_tpu.models.hubert import (EncoderWithHead,
                                                     HubertConfig)
    from speech_inpainting_tpu.train.ea import (EAConfig, create_state,
                                                make_train_step)
    from speech_inpainting_tpu.utils.timing import force

    B, T = 16, 80000        # 5 s @ 16 kHz (config.yaml max_wav_length)
    cfg = EAConfig(mask_length=20)
    hcfg = HubertConfig.base(dtype=dtype)
    model = EncoderWithHead(hcfg, out_dim=80)
    rng = np.random.default_rng(0)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 3200)))["params"]
    state = create_state(cfg, params)
    centroids = rng.standard_normal((100, 80)).astype(np.float32)
    step_fn = make_train_step(model, cfg, centroids)
    n_frames = int(hcfg.feature_lengths(np.array([T]))[0])
    batch = {
        "wav": jnp.asarray(rng.standard_normal((B, T)), jnp.float32),
        "attn_mask": jnp.ones((B, T), jnp.int32),
        "mask_pos": jnp.asarray(rng.integers(
            0, n_frames - cfg.mask_length, B), jnp.int32),
        "labels": jnp.asarray(rng.integers(0, 100, (B, cfg.mask_length)),
                              jnp.int32),
    }
    t0 = time.perf_counter()
    # AOT-compile once; reused for stepping and the roofline analysis
    step = jax.jit(step_fn).lower(state, batch).compile()
    state, m = step(state, batch)
    force(m)
    compile_s = time.perf_counter() - t0
    best = np.inf
    for _ in range(iters):
        t0 = time.perf_counter()
        state, m = step(state, batch)
        force(m)
        best = min(best, time.perf_counter() - t0)
    def window(n):                          # pipelined (see bench_gan)
        nonlocal state
        t0 = time.perf_counter()
        m = None
        for _ in range(n):
            state, m = step(state, batch)
        force(m)
        return time.perf_counter() - t0

    pipe, differenced = pipelined_step_time(window, best)
    sps = 1.0 / pipe
    audio_sps = sps * B * T / 16000.0
    key = "bf16" if dtype != jnp.float32 else "f32"
    out = {
        "metric": "ea_hubert_base_train_step",
        "value": round(sps, 3),
        "unit": f"steps/sec pipelined (B16 x 5s, {key})",
        "steps_per_sec_synced": round(1.0 / best, 3),
        "differenced": differenced,
        "audio_sec_per_sec_per_chip": round(audio_sps, 2),
        "compile_seconds": round(compile_s, 1),
    }
    if roofline:
        out["roofline"] = roofline_floors(step, key, pipe, best)
    print(json.dumps(out))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cache", action="store_true",
                    help="enable the persistent XLA compilation cache")
    ap.add_argument("--workload", default="all",
                    choices=["gan", "istft", "ea", "scan", "scan_v1", "all"])
    ap.add_argument("--bf16", action="store_true",
                    help="bf16 matmul/conv params (reference trains f32)")
    ap.add_argument("--batched-disc", action="store_true",
                    help="real+fake through each weight-norm discriminator "
                         "as one 2B forward (bit-identical; see train/gan)")
    ap.add_argument("--folded-mpd", action="store_true",
                    help="MPD period fold laid out (B,C,p,T/p) — long axis "
                         "on the TPU lanes (same params/losses)")
    ap.add_argument("--bf16-disc", action="store_true",
                    help="discriminator convs compute in bf16 (params f32, "
                         "f32 loss reductions; GANConfig.disc_bf16)")
    ap.add_argument("--roofline", action="store_true",
                    help="XLA cost analysis -> compute/memory floors for "
                         "the GAN step")
    args = ap.parse_args()
    if args.cache:
        from speech_inpainting_tpu.utils.cache import enable_persistent_cache
        print(f"# compilation cache: {enable_persistent_cache()}")
    import jax.numpy as jnp
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    if args.workload in ("gan", "all"):
        bench_gan(dtype, batched_disc=args.batched_disc,
                  folded_mpd=args.folded_mpd, disc_bf16=args.bf16_disc,
                  roofline=args.roofline)
    if args.workload == "istft":
        bench_gan(dtype, batched_disc=args.batched_disc,
                  disc_bf16=args.bf16_disc, roofline=args.roofline,
                  family="istft")
    if args.workload == "scan":
        bench_scan("istft")
    if args.workload == "scan_v1":
        bench_scan("v1")
    if args.workload in ("ea", "all"):
        bench_ea(dtype, roofline=args.roofline)


if __name__ == "__main__":
    main()
