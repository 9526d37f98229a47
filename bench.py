"""Benchmark: informed-inpainting throughput (audio-sec/sec/chip).

Drives the flagship fused graph — wav → mask → mel(hop441) → HuBERT-base+head
→ nearest-centroid splice → extend_mel → HiFi-GAN V1 → wav — on the default
JAX device with a 200 ms mask (the BASELINE.json north-star config), batched
over real LJSpeech audio from the reference checkout.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is value / 50 (the ≥50× real-time target for TPU v5e-1).
"""
import json
import time

import numpy as np


def load_wavs():
    """Real audio: reference test files, tiled to a batch (host-side resample
    16k variant exists alongside 22k)."""
    from scipy.io import wavfile
    sr22, w22 = wavfile.read(
        "/root/reference/I_ea/hifi_gan/test_files/LJ001-0001_22k.wav")
    sr16, w16 = wavfile.read(
        "/root/reference/I_ea/hifi_gan/test_files/LJ001-0001_16k.wav")
    assert sr22 == 22050 and sr16 == 16000
    return (w22 / 32768.0).astype(np.float32), (w16 / 32768.0).astype(np.float32)


def check_pallas():
    """Compile fused_resblock1 NON-interpret on the chip and compare against
    the XLA chain (VERDICT r2 #8): a libtpu/Mosaic bump that breaks the
    kernel shows up in the round's bench artifact instead of a later debug
    session. Serving defaults to the XLA path, so this is the only
    automatic real-hardware signal the kernel gets."""
    import jax
    import jax.numpy as jnp
    from speech_inpainting_tpu.ops.conv import conv1d, get_padding
    from speech_inpainting_tpu.ops.pallas_resblock import fused_resblock1

    def unfused(x, w1, b1, w2, b2, dils, K):
        # f32 reference must run HIGHEST precision: the kernel requests
        # true-f32 MXU passes (ops/pallas_resblock.py:51-56), while XLA's
        # DEFAULT f32 conv uses bf16 passes (~2.7e-3 rel) — comparing
        # against the low-precision reference would flag a healthy kernel.
        # bf16 stays DEFAULT: both sides are the native single pass.
        prec = "highest" if x.dtype == jnp.float32 else None
        for s, d in enumerate(dils):
            h = jax.nn.leaky_relu(x, 0.1)
            h = conv1d(h, w1[s], b1[s], dilation=d, padding=get_padding(K, d),
                       precision=prec)
            h = jax.nn.leaky_relu(h, 0.1)
            h = conv1d(h, w2[s], b2[s], dilation=1, padding=get_padding(K, 1),
                       precision=prec)
            x = x + h
        return x

    rng = np.random.default_rng(7)
    B, C, T, K, dils = 2, 32, 4096, 3, (1, 3, 5)
    S = len(dils)
    result = {}
    try:
        for dtype, tol in ((jnp.float32, 2e-5), (jnp.bfloat16, 3e-2)):
            x = jnp.asarray(rng.standard_normal((B, C, T)), dtype)
            w1 = jnp.asarray(rng.standard_normal((S, C, C, K)) * 0.1, dtype)
            w2 = jnp.asarray(rng.standard_normal((S, C, C, K)) * 0.1, dtype)
            b1 = jnp.asarray(rng.standard_normal((S, C)) * 0.1, dtype)
            b2 = jnp.asarray(rng.standard_normal((S, C)) * 0.1, dtype)
            got = np.asarray(jax.jit(lambda *a: fused_resblock1(
                *a, dilations=dils, tile=2048))(x, w1, b1, w2, b2),
                np.float32)
            want = np.asarray(jax.jit(lambda *a: unfused(*a, dils, K))(
                x, w1, b1, w2, b2), np.float32)
            rel = float(np.abs(got - want).max()
                        / max(np.abs(want).max(), 1e-8))
            result[f"rel_err_{jnp.dtype(dtype).name}"] = round(rel, 8)
            result["ok"] = result.get("ok", True) and rel < tol
    except Exception as e:
        result = {"ok": False, "error": f"{type(e).__name__}: {e}"[:200]}
    return result


def latest_vocoder_gate(repo_dir):
    """Newest round's vocoder_gate: EVAL_r*.json sorted by round number,
    newest first, first file that parses and carries the gate wins —
    bench.py must never pin a literal round filename (r4 weak #5: a
    hardcoded EVAL_r04.json would silently keep promoting on a stale
    verdict once r5 writes its own). Returns (gate dict, source filename or
    None)."""
    import re
    from pathlib import Path
    files = []
    for p in Path(repo_dir).glob("EVAL_r*.json"):
        m = re.fullmatch(r"EVAL_r(\d+)\.json", p.name)
        if m:
            files.append((int(m.group(1)), p))
    for _, p in sorted(files, reverse=True):
        try:
            with open(p) as f:
                gate = json.load(f).get("vocoder_gate")
        except Exception:
            continue
        if gate:
            return gate, p.name
    return {}, None


def main():
    import jax
    import jax.numpy as jnp
    from speech_inpainting_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()   # the flagship graphs take ~15 min cold
    from speech_inpainting_tpu.infer.inpaint import (InformedInpainter,
                                                     InpainterConfig)
    from speech_inpainting_tpu.models.hifigan import Generator, HiFiGANConfig
    from speech_inpainting_tpu.models.hubert import (EncoderWithHead,
                                                     HubertConfig)

    w22, w16 = load_wavs()
    seconds = 4.0
    t22, t16 = int(22050 * seconds), int(16000 * seconds)
    w22, w16 = w22[:t22], w16[:t16]
    B = 256   # HBM sweet spot on v5e-1 (512 OOMs)
    rng = np.random.default_rng(0)
    # decorrelate batch rows by circular shifts of the real utterance
    wav22 = np.stack([np.roll(w22, int(s)) for s in
                      rng.integers(0, t22, B)]).astype(np.float32)
    wav16 = np.stack([np.roll(w16, int(s)) for s in
                      rng.integers(0, t16, B)]).astype(np.float32)
    n_frames = t16 // 320
    mask_len = 10  # 200 ms
    mask_pos = rng.integers(1, n_frames - mask_len - 1, B).astype(np.int32)

    hcfg = HubertConfig.base(dtype=jnp.bfloat16)
    gcfg = HiFiGANConfig(dtype=jnp.bfloat16)
    hub = EncoderWithHead(hcfg, out_dim=80)
    hp = hub.init(jax.random.PRNGKey(0), jnp.zeros((1, 3200)))["params"]
    gen = Generator(gcfg)
    gp = gen.init(jax.random.PRNGKey(1), jnp.zeros((1, 80, 8)))["params"]
    centroids = jnp.asarray(rng.standard_normal((100, 80)), jnp.float32)
    inp = InformedInpainter(InpainterConfig(hubert=hcfg, hifigan=gcfg),
                            hp, gp, centroids)

    from speech_inpainting_tpu.utils.timing import force

    # stage inputs on device once (the training/serving pipelines keep data
    # device-resident / overlap H2D via prefetch; the tunnel's transfer
    # bandwidth is not the metric here)
    wav22 = jnp.asarray(wav22)
    wav16 = jnp.asarray(wav16)
    mask_pos = jnp.asarray(mask_pos)
    force((wav22, wav16))
    lens = jnp.full((B,), mask_len, jnp.int32)
    out = force(inp.batch(wav22, wav16, mask_pos, lens))   # compile
    # `force` reads output elements back — block_until_ready alone returns
    # early on remote-execution backends and inflates throughput ~16x
    n_iter, best = 5, np.inf
    for _ in range(n_iter):
        t0 = time.perf_counter()
        out = force(inp.batch(wav22, wav16, mask_pos, lens))
        best = min(best, time.perf_counter() - t0)

    audio_sec = B * out["inpainted"].shape[-1] / 22050.0
    rtf_synced = audio_sec / best

    # throughput the way a saturated server runs: batches dispatched
    # back-to-back, results drained asynchronously — one force at the end.
    # Measured by LOOP-COUNT DIFFERENCING: time a short and a long pipelined
    # window and divide the difference — the tunnel's constant dispatch +
    # readback cost (observed anywhere from ~0.25 s to ~25 s in congested
    # windows) cancels, so the driver's end-of-round number can't record a
    # phantom regression when the tunnel is busy. The per-iteration force
    # above pays that cost inside every measurement; that synced number is
    # the per-batch LATENCY, kept alongside.
    from speech_inpainting_tpu.utils.timing import differenced_or_fallback

    def pipelined_per_batch(call, fallback_s):
        """Differenced per-batch seconds; falls back to the synced number
        (never divides a noise-clamped delta) and says so in the JSON."""
        def window(n):
            t0 = time.perf_counter()
            out = None
            for _ in range(n):
                out = call()
            force(out)
            return time.perf_counter() - t0
        return differenced_or_fallback(window, fallback_s)

    per_batch, measured = pipelined_per_batch(
        lambda: inp.batch(wav22, wav16, mask_pos, lens), best)
    rtf = audio_sec / per_batch

    # beyond-parity fast engine: same inpainting graph with the full-width
    # iSTFT-head vocoder (models/hifigan_istft.py) in place of V1 — the
    # architectural answer to the serving graph's HBM-bound tail
    from speech_inpainting_tpu.models.hifigan_istft import (
        ISTFTGenerator, ISTFTGeneratorConfig)
    igen = ISTFTGenerator(ISTFTGeneratorConfig(dtype=jnp.bfloat16))
    igp = igen.init(jax.random.PRNGKey(2), jnp.zeros((1, 80, 8)))["params"]
    inp_fast = InformedInpainter(InpainterConfig(hubert=hcfg, hifigan=gcfg),
                                 hp, igp, centroids, generator=igen)
    out2 = force(inp_fast.batch(wav22, wav16, mask_pos, lens))   # compile
    # fallback must be min-of-several synced samples (like the V1 path's
    # `best`): congestion both triggers the fallback and inflates single
    # samples, so one sample could record a phantom ~60x regression
    fast_synced = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        force(inp_fast.batch(wav22, wav16, mask_pos, lens))
        fast_synced = min(fast_synced, time.perf_counter() - t0)
    per_batch2, measured2 = pipelined_per_batch(
        lambda: inp_fast.batch(wav22, wav16, mask_pos, lens), fast_synced)
    rtf2 = B * out2["inpainted"].shape[-1] / 22050.0 / per_batch2

    # Flagship promotion is QUALITY-GATED (r4 verdict #1): the iSTFT fast
    # engine only becomes the headline number when the same-lineage
    # two-family mask sweep says it matches/beats V1 (EVAL_r04.json
    # vocoder_gate, examples/eval_e2e.py stage_report). The V1 line always
    # stays alongside for reference-checkpoint parity.
    from pathlib import Path
    gate, gate_src = latest_vocoder_gate(Path(__file__).resolve().parent)
    promote = bool(gate.get("istft_wins_quality_gate"))

    v1_line = {
        "value": round(rtf, 2),
        "unit": "audio-sec/sec/chip (HiFi-GAN V1 engine — the "
                "reference-checkpoint-parity vocoder)",
        "vs_baseline": round(rtf / 50.0, 3),
        "differenced": measured,
    }
    istft_line = {
        "value": round(rtf2, 2),
        "unit": "audio-sec/sec/chip (iSTFT-head fast engine, full width)",
        "vs_baseline": round(rtf2 / 50.0, 3),
        "differenced": measured2,
    }
    flag, other_key, other = ((istft_line, "v1_engine", v1_line) if promote
                              else (v1_line, "fast_engine_istft",
                                    istft_line))
    print(json.dumps({
        "metric": "informed_inpaint_throughput",
        "value": flag["value"],
        "unit": flag["unit"] + (" pipelined, loop-count-differenced "
                                f"(HuBERT-base, 200ms mask, bf16, batch "
                                f"{B}x{seconds:.0f}s)"),
        "vs_baseline": flag["vs_baseline"],
        # False = congestion made the differenced delta non-credible and the
        # value above is the conservative per-batch-synced fallback
        "differenced": flag["differenced"],
        "engine": "istft" if promote else "v1",
        "quality_gate": (
            {"istft_wins": True, "verdict": gate.get("verdict"),
             "wins": gate.get("wins"),
             "source": f"{gate_src} vocoder_gate (same-lineage two-family "
                       "mask sweep over the width-192 eval-chain proxy "
                       "models — the quality evidence is proxy-scale; the "
                       "full-width engines share the architecture)"}
            if promote else
            {"istft_wins": False,
             "note": (f"no vocoder_gate win on record in {gate_src} — "
                      if gate_src else
                      "no EVAL_r*.json vocoder_gate found — ") +
                     "flagship stays the V1 engine"}),
        other_key: other,
        "synced_per_batch": {
            "value": round(rtf_synced, 2),
            "unit": "audio-sec/sec/chip with a device sync per batch (the "
                    "r1/r2 methodology; includes the tunnel's per-readback "
                    "cost — this is per-batch latency, not throughput; V1 "
                    "engine)"},
        # real-hardware Mosaic revalidation of the Pallas kernel family
        # (serving uses the XLA path; this is the kernels' canary)
        "pallas_fused_resblock1": check_pallas(),
    }))


if __name__ == "__main__":
    main()
