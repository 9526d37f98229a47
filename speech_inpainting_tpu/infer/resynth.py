"""Unit resynthesis: CodeGenerator inference with an RTF meter and the
voice-conversion sweep.

Behavior matched (code new):
  - `generate` + RTF = wall / audio-seconds (I_da/src/dataset.py:225-244)
  - inference over dataset items / code files (I_da/scripts/inference.py:68-327)
  - voice conversion: fill the speaker id with a target speaker and renorm
    the f0 stream from source to target statistics
    (inference.py:200-222)
"""
from __future__ import annotations

import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.codegen import CodeGenerator, CodeGeneratorConfig


class Resynthesizer:
    def __init__(self, cfg: CodeGeneratorConfig, params, vq_tree):
        self.cfg = cfg
        self._model = CodeGenerator(cfg)
        self._params = params
        self._vq = vq_tree

        def fwd(params, code, f0, emb, spkr):
            return self._model.apply(
                {"params": params, "vq": self._vq}, code, f0=f0, emb=emb,
                spkr=spkr)[:, 0]
        self._fwd = jax.jit(fwd)

    def __call__(self, code, f0=None, emb=None, spkr=None):
        """code (B, F) [+ f0 (B,1,Ff), emb (B,E) | spkr (B,)] → (wav (B,T),
        rtf). RTF = wall seconds per generated audio second (the reference's
        `generate` meter, I_da/src/dataset.py:236-244). Single-utterance RTF
        through the remote-TPU tunnel is dispatch-bound (~30 ms floor per
        call) — treat it as a protocol measurement; the serving number is
        the batched bench.py throughput."""
        from ..utils.timing import force
        code = jnp.asarray(code, jnp.int32)
        args = (self._params, code,
                None if f0 is None else jnp.asarray(f0, jnp.float32),
                None if emb is None else jnp.asarray(emb, jnp.float32),
                None if spkr is None else jnp.asarray(spkr, jnp.int32))
        t0 = time.perf_counter()
        wav = force(self._fwd(*args))
        wall = time.perf_counter() - t0
        audio_sec = wav.shape[0] * wav.shape[-1] / self.cfg.hifigan.sampling_rate
        return np.asarray(wav), wall / audio_sec

    def voice_convert(self, item: Dict, target_spkr: int, f0_stats: Dict,
                      target_emb: Optional[np.ndarray] = None):
        """Re-synthesize an item as another speaker: swap spkr/emb and map
        voiced f0 from source to target statistics."""
        src = f0_stats.get(int(item["spkr"].reshape(-1)[0]), f0_stats)
        tgt = f0_stats.get(int(target_spkr), f0_stats)
        f0 = np.asarray(item["f0"], np.float32)
        voiced = f0 != 0
        denorm = f0 * src["f0_std"] + src["f0_mean"]
        renorm = (denorm - tgt["f0_mean"]) / max(tgt["f0_std"], 1e-8)
        f0 = np.where(voiced, renorm, 0.0)
        emb = target_emb if target_emb is not None else item.get("emb")
        spkr = np.full_like(np.asarray(item["spkr"]).reshape(1, -1)[:, :1],
                            target_spkr)
        return self(np.asarray(item["code"])[None] if
                    np.asarray(item["code"]).ndim == 1 else item["code"],
                    f0 if f0.ndim == 3 else f0[None],
                    None if emb is None else np.asarray(emb)[None]
                    if np.asarray(emb).ndim == 1 else emb,
                    spkr)
