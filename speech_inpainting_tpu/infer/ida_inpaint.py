"""I_da blind/informed inpainting: frozen HuBERT units + unit-HiFi-GAN.

Re-designs the reference driver (I_da/scripts/inpainting.py:151-266) as one
jitted graph per utterance length:

    audio ── zero-mask ── HuBERT(layer tap) ── k-means units ─┐ splice
    audio ──────────────  HuBERT(layer tap) ── k-means units ─┘   │
    audio ── f0 track ── voiced z-norm ────────────────────────── CodeGenerator ── wav

Conventions matched:
  - mask: (y + 1e-6)·mask with zeros at [start, start+mask_size)
    (inpainting.py:188-192; default start = 1.5 s · sr :187)
  - informed splice: unit frames OUTSIDE the mask come from the clean
    stream, frames inside stay the blind (masked-input) predictions
    (:209-214)
  - f0 from the CLEAN audio, z-normed over its own voiced stats (:216-218)
  - LCM length matching of (audio 1, code 320, f0 80) and the trim to a
    multiple of 16·80 samples required by the pitch quantizer (:221-257)
  - outputs inf-normalized (librosa.util.normalize, :261-266)

The reference runs this per-file in a multiprocessing Pool with two fairseq
HuBERT forwards + sklearn predicts per mask size; here the whole thing is a
single accelerator graph, reused across mask sizes/positions (traced scalars).
"""
from __future__ import annotations

import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.codegen import CodeGenerator, CodeGeneratorConfig
from ..models.hubert import HubertConfig, HubertModel
from ..ops.f0 import F0Config, extract_f0, normalize_nonzero
from ..ops.masking import mask_span
from ..quantize.kmeans import assign


def _peak_norm(x, eps=1e-10):
    return x / jnp.maximum(jnp.max(jnp.abs(x), axis=-1, keepdims=True), eps)


class IdaInpainter:
    def __init__(self, codegen_cfg: CodeGeneratorConfig, codegen_params,
                 vq_tree, hubert_cfg: HubertConfig, hubert_params,
                 centroids, *, tap_layer: Optional[int] = None,
                 f0_cfg: F0Config = F0Config(), code_hop: int = 320):
        self.cfg = codegen_cfg
        self.hubert_cfg = hubert_cfg
        self.tap_layer = tap_layer
        self.f0_cfg = f0_cfg
        self.code_hop = code_hop
        self._codegen = CodeGenerator(codegen_cfg)
        self._hubert = HubertModel(hubert_cfg)
        self._cg_params = codegen_params
        self._vq = vq_tree
        self._h_params = hubert_params
        self._C = jnp.asarray(centroids, jnp.float32)
        self._graph = jax.jit(self._graph_impl)

    def _units(self, hp, audio):
        feats = self._hubert.apply({"params": hp}, audio[None],
                                   tap_layer=self.tap_layer)[0]
        return assign(feats, self._C)                 # (frames,)

    def _graph_impl(self, hp, cg, audio, mask_start, mask_size, emb, spkr):
        masked = mask_span(audio + 1e-6, mask_start, mask_size)

        code_clean = self._units(hp, audio)
        code_blind = self._units(hp, masked)
        # informed splice: clean units outside the mask (code-frame scale)
        idx = jnp.arange(code_clean.shape[0])
        inside = (idx >= mask_start // self.code_hop) & \
                 (idx < (mask_start + mask_size) // self.code_hop)
        code_inp = jnp.where(inside, code_blind, code_clean)

        f0 = extract_f0(audio, self.f0_cfg)
        # reference normalizes by the RAW stream's mean/std (zeros included,
        # inpainting.py:217: normalize_nonzero(f0, np.mean(f0), np.std(f0)))
        mean = jnp.mean(f0)
        std = jnp.maximum(jnp.std(f0), 1e-8)
        f0n = normalize_nonzero(f0, mean, std)

        # static LCM alignment of (audio 1, code 320, f0 80) + the 1280-
        # sample trim for the pitch quantizer (16·80)
        n_code = code_clean.shape[0]
        n_f0 = f0n.shape[0]
        unit = 320                                     # lcm(1, 320, 80)
        n_unit = min(audio.shape[-1] // unit, n_code, n_f0 // 4)
        samples = n_unit * unit
        samples -= samples % (16 * 80)
        code_inp = code_inp[:samples // self.code_hop]
        code_clean_t = code_clean[:samples // self.code_hop]
        f0n = f0n[:samples // 80]

        def vocode(code):
            return self._codegen.apply(
                {"params": cg, "vq": self._vq}, code[None],
                f0=f0n[None, None, :], emb=emb, spkr=spkr)[0, 0]

        audio_gen = vocode(code_clean_t)
        audio_inp = vocode(code_inp)
        return dict(audio_gt=_peak_norm(audio[:samples]),
                    audio_mask=_peak_norm(masked[:samples]),
                    audio_gen=_peak_norm(audio_gen),
                    audio_inpainted=_peak_norm(audio_inp),
                    code_clean=code_clean, code_inpainted=code_inp)

    def __call__(self, audio, mask_size: int, *,
                 mask_start: Optional[int] = None,
                 emb: Optional[np.ndarray] = None,
                 spkr: Optional[int] = None) -> Dict:
        """audio: (T,) float 16 kHz; mask_size in samples. Returns the four
        reference wav outputs + unit streams + 'rtf'."""
        sr = self.cfg.hifigan.sampling_rate
        if mask_start is None:
            mask_start = int(sr * 3 / 2)               # reference fixed 1.5 s
        emb_a = None if emb is None else jnp.asarray(emb, jnp.float32)[None]
        spkr_a = None if spkr is None else jnp.asarray([[spkr]], jnp.int32)
        from ..utils.timing import force
        t0 = time.perf_counter()
        out = self._graph(self._h_params, self._cg_params,
                          jnp.asarray(audio, jnp.float32),
                          jnp.asarray(mask_start, jnp.int32),
                          jnp.asarray(mask_size, jnp.int32), emb_a, spkr_a)
        out = force(out)
        wall = time.perf_counter() - t0
        out = {k: np.asarray(v) for k, v in out.items()}
        out["rtf"] = wall / (len(out["audio_gen"]) / sr)
        return out
