"""Serving roofline for BOTH inpainting engines (VERDICT r4 #6): XLA cost
analysis of the flagship B256 informed-inpainting graphs — HiFi-GAN V1 (the
reference-parity vocoder, I_ea/hifi_gan/models.py:12-133 geometry) and the
promoted iSTFT-head fast engine — plus pipelined per-batch wall time, so
docs/PERFORMANCE.md can state each engine's measured fraction of its
compute/memory floor instead of only V1's.

Same graph/batch/config as bench.py (HuBERT-base + 200 ms mask, bf16,
B256 x 4 s); floors use the v5e-1 peaks bench_train.py documents
(197 TF/s bf16 MXU, 819 GB/s HBM).

    PYTHONPATH=/root/repo:/root/.axon_site python examples/serving_roofline.py
"""
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

PEAK_FLOPS_BF16 = 197e12
PEAK_HBM = 819e9


def main():
    import jax
    import jax.numpy as jnp
    from speech_inpainting_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()
    from speech_inpainting_tpu.infer.inpaint import (InformedInpainter,
                                                     InpainterConfig)
    from speech_inpainting_tpu.models.hifigan import Generator, HiFiGANConfig
    from speech_inpainting_tpu.models.hifigan_istft import (
        ISTFTGenerator, ISTFTGeneratorConfig)
    from speech_inpainting_tpu.models.hubert import (EncoderWithHead,
                                                     HubertConfig)
    from speech_inpainting_tpu.utils.timing import (differenced_or_fallback,
                                                    force)

    from scipy.io import wavfile
    _, w22 = wavfile.read(
        "/root/reference/I_ea/hifi_gan/test_files/LJ001-0001_22k.wav")
    _, w16 = wavfile.read(
        "/root/reference/I_ea/hifi_gan/test_files/LJ001-0001_16k.wav")
    w22 = (w22 / 32768.0).astype(np.float32)
    w16 = (w16 / 32768.0).astype(np.float32)
    seconds, B = 4.0, 256
    t22, t16 = int(22050 * seconds), int(16000 * seconds)
    rng = np.random.default_rng(0)
    wav22 = jnp.asarray(np.stack([np.roll(w22[:t22], int(s)) for s in
                                  rng.integers(0, t22, B)]))
    wav16 = jnp.asarray(np.stack([np.roll(w16[:t16], int(s)) for s in
                                  rng.integers(0, t16, B)]))
    n_frames = t16 // 320
    mask_pos = jnp.asarray(rng.integers(1, n_frames - 11, B), jnp.int32)
    lens = jnp.full((B,), 10, jnp.int32)
    force((wav22, wav16))

    hcfg = HubertConfig.base(dtype=jnp.bfloat16)
    gcfg = HiFiGANConfig(dtype=jnp.bfloat16)
    hub = EncoderWithHead(hcfg, out_dim=80)
    hp = hub.init(jax.random.PRNGKey(0), jnp.zeros((1, 3200)))["params"]
    centroids = jnp.asarray(rng.standard_normal((100, 80)), jnp.float32)

    report = {}
    engines = {
        "v1": (Generator(gcfg),
               Generator(gcfg).init(jax.random.PRNGKey(1),
                                    jnp.zeros((1, 80, 8)))["params"], False),
        "istft": (ISTFTGenerator(ISTFTGeneratorConfig(dtype=jnp.bfloat16)),
                  ISTFTGenerator(ISTFTGeneratorConfig(dtype=jnp.bfloat16))
                  .init(jax.random.PRNGKey(2),
                        jnp.zeros((1, 80, 8)))["params"], True)}
    for name, (gen, gp, override) in engines.items():
        inp = InformedInpainter(InpainterConfig(hubert=hcfg, hifigan=gcfg),
                                hp, gp, centroids,
                                generator=gen if override else None)
        args = (inp._hubert_params, inp._gen_params, inp._C_centered,
                inp._center, wav22, wav16, mask_pos, lens)
        t0 = time.perf_counter()
        compiled = inp._graph.lower(*args).compile()
        compile_s = time.perf_counter() - t0
        cost = compiled.cost_analysis()
        if isinstance(cost, list):
            cost = cost[0] if cost else {}
        flops = float(cost.get("flops", 0.0))
        byts = float(cost.get("bytes accessed", 0.0))

        out = force(inp.batch(wav22, wav16, mask_pos, lens))   # warm
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            out = force(inp.batch(wav22, wav16, mask_pos, lens))
            best = min(best, time.perf_counter() - t0)

        def window(n):
            t0 = time.perf_counter()
            o = None
            for _ in range(n):
                o = inp.batch(wav22, wav16, mask_pos, lens)
            force(o)
            return time.perf_counter() - t0

        per_batch, differenced = differenced_or_fallback(window, best)
        audio_sec = B * int(out["inpainted"].shape[-1]) / 22050.0
        floor_c = flops / PEAK_FLOPS_BF16
        floor_m = byts / PEAK_HBM
        report[name] = {
            "tflops_per_batch": round(flops / 1e12, 2),
            "gbytes_per_batch": round(byts / 1e9, 2),
            "compute_floor_ms": round(floor_c * 1e3, 1),
            "memory_floor_ms": round(floor_m * 1e3, 1),
            "measured_ms_pipelined": round(per_batch * 1e3, 1),
            "measured_ms_synced": round(best * 1e3, 1),
            "differenced": differenced,
            "pct_of_roofline": round(
                100 * max(floor_c, floor_m) / per_batch, 1),
            "audio_sec_per_sec": round(audio_sec / per_batch, 1),
            "compile_seconds": round(compile_s, 1),
        }
        print(json.dumps({name: report[name]}), flush=True)
    dest = Path(__file__).resolve().parents[1] / "SERVING_ROOFLINE_r05.json"
    with open(dest, "w") as f:
        json.dump({"config": "B256 x 4s, bf16, HuBERT-base, 200ms mask "
                             "(bench.py flagship graph)",
                   "peaks": {"mxu_bf16_tf_s": 197, "hbm_gb_s": 819},
                   "engines": report}, f, indent=2)
    print(f"wrote {dest}")


if __name__ == "__main__":
    main()
