"""I_da datasets: CodeDataset (units + f0 + speaker + audio + mel) and
F0Dataset (f0 only), with one-time cached preprocessing.

Behavior matched to I_da/src/dataset.py:246-545 (code new):
  - per utterance: load 16 kHz audio → ×0.95 inf-norm → speaker d-vector →
    f0 (tracked on device by ops.f0, z-normalized per speaker) → full-band
    loss mel → LCM length matching of (audio 1, code 320, f0 80, mel 256)
  - __getitem__-equivalent batching: aligned random segment clips
    (segment_size samples; hop-aligned starts)
  - the preprocessing cache is content-addressed (hash of file list +
    params), fixing the reference's count-only staleness check
    (dataset.py:296-300)

Speaker embeddings: the reference uses a TorchScript Resemblyzer d-vector
(dataset.py:283-284). `torchscript_embedder(...)` loads those files when
available; `mel_stats_embedder` is the self-contained fallback (log-mel
mean/std pooling) so the pipeline runs without external artifacts.
"""
from __future__ import annotations

import dataclasses
import hashlib
import json
import os
from pathlib import Path
from typing import Callable, Dict, Iterator, List, Optional, Sequence

import numpy as np

import jax.numpy as jnp

from ..ops.f0 import F0Config, extract_f0, normalize_nonzero
from ..ops.mel import VOCODER_MEL_16K_FULLBAND, MelConfig, mel_spectrogram
from .audio import load_wav, peak_normalize
from .manifests import parse_speaker
from .multiseries import clip_segment_random, match_length

F0_PAD_BUCKET = 8000  # pad utterances to 0.5 s buckets before the jitted
                      # f0 tracker so lengths (and compilations) are bounded


def mel_stats_embedder(dim: int = 256):
    """Deterministic speaker embedding: mean⊕std of a 25 ms/10 ms log-mel,
    tiled/truncated to `dim`. A stand-in for the reference's external
    TorchScript d-vector — same interface, no external artifact."""
    cfg = MelConfig(sampling_rate=16000, n_fft=400, num_mels=80, hop_size=160,
                    win_size=400, fmax=None)

    def embed(wav: np.ndarray, sr: int) -> np.ndarray:
        assert sr == 16000
        mel = np.asarray(mel_spectrogram(jnp.asarray(wav), cfg))
        stats = np.concatenate([mel.mean(axis=1), mel.std(axis=1)])
        reps = int(np.ceil(dim / stats.size))
        emb = np.tile(stats, reps)[:dim].astype(np.float32)
        return emb / (np.linalg.norm(emb) + 1e-8)

    return embed


def torchscript_embedder(wav2mel_path: str, embedder_path: str):
    """Load the reference's TorchScript wav2mel + d-vector embedder pair."""
    import torch

    wav2mel = torch.jit.load(wav2mel_path, map_location="cpu")
    embedder = torch.jit.load(embedder_path, map_location="cpu").eval()

    def embed(wav: np.ndarray, sr: int) -> np.ndarray:
        t = torch.from_numpy(np.asarray(wav, np.float32))[None]
        mel = wav2mel(t, sr)
        with torch.no_grad():
            return embedder.embed_utterance(mel).cpu().numpy()

    return embed


def _extract_f0_bucketed(wav: np.ndarray, cfg: F0Config) -> np.ndarray:
    """Pad to a length bucket (bounded jit specializations), track, trim."""
    n = len(wav)
    pad = (-n) % F0_PAD_BUCKET
    f0 = np.asarray(extract_f0(np.pad(wav, (0, pad)), cfg))
    return f0[:cfg.num_frames(n)]


@dataclasses.dataclass(frozen=True)
class CodeDatasetConfig:
    segment_size: int = 8960
    code_hop_size: int = 320
    mel: MelConfig = VOCODER_MEL_16K_FULLBAND
    f0: F0Config = F0Config()
    f0_hop: int = 80
    multispkr: Optional[str] = "_"    # parse_speaker method; falsy =
                                      # single-speaker (dataset.py:288 gates
                                      # parsing behind `if path_to_name:`)
    f0_normalize: bool = True
    embedding_dim: int = 256


class CodeDataset:
    """(files, codes) from a JSON-lines manifest → aligned training items."""

    def __init__(self, files: Sequence, codes: Sequence[np.ndarray],
                 cfg: CodeDatasetConfig = CodeDatasetConfig(), *,
                 f0_stats: Optional[Dict] = None,
                 embedder: Optional[Callable] = None,
                 cache_dir: Optional[str] = None):
        assert len(files) == len(codes)
        self.files = [str(f) for f in files]
        self.codes = [np.asarray(c).astype(np.int64) for c in codes]
        self.cfg = cfg
        self.f0_stats = f0_stats
        self.embedder = embedder or mel_stats_embedder(cfg.embedding_dim)
        if cfg.multispkr:
            self.id_to_spkr = sorted({parse_speaker(f, cfg.multispkr)
                                      for f in self.files})
        else:                         # single-speaker (falsy multispkr)
            self.id_to_spkr = ["A"]
        self.spkr_to_id = {s: i for i, s in enumerate(self.id_to_spkr)}
        self._cache_dir = cache_dir
        self.items = [self._load_item(i) for i in range(len(self.files))]

    # ---- preprocessing ---------------------------------------------------

    def _item_key(self, idx: int) -> str:
        h = hashlib.sha256()
        h.update(json.dumps({
            "file": self.files[idx], "code": self.codes[idx].tolist(),
            "seg": self.cfg.segment_size, "mel": dataclasses.asdict(
                self.cfg.mel) if hasattr(self.cfg.mel, "__dataclass_fields__")
            else str(self.cfg.mel),
            "f0n": self.cfg.f0_normalize}, default=str).encode())
        return h.hexdigest()[:20]

    def _spk_stats(self, spk_idx: int):
        stats = self.f0_stats or {"f0_mean": 0.0, "f0_std": 1.0}
        if isinstance(stats, dict) and spk_idx in stats:
            stats = stats[spk_idx]
        return float(stats["f0_mean"]), float(stats["f0_std"])

    def _preprocess(self, idx: int) -> dict:
        cfg = self.cfg
        wav, sr = load_wav(self.files[idx], target_sr=16000)
        audio = peak_normalize(wav, 0.95)
        spkr = (self.spkr_to_id[parse_speaker(self.files[idx],
                                              cfg.multispkr)]
                if cfg.multispkr else 0)
        emb = np.asarray(self.embedder(audio, sr), np.float32)

        f0 = _extract_f0_bucketed(audio, cfg.f0)
        if cfg.f0_normalize:
            mean, std = self._spk_stats(spkr)
            if self.f0_stats is None:           # per-utterance fallback
                voiced = f0[f0 > 0]
                mean = float(voiced.mean()) if voiced.size else 0.0
                std = float(voiced.std()) if voiced.size else 1.0
            f0 = np.asarray(normalize_nonzero(f0, mean, max(std, 1e-8)))

        mel = np.asarray(mel_spectrogram(jnp.asarray(audio), cfg.mel))
        code = self.codes[idx]

        audio_m, code_m, f0_m, mel_m = match_length(
            [(audio, 1), (code, cfg.code_hop_size), (f0, cfg.f0_hop),
             (mel, cfg.mel.hop_size)], min_length=cfg.segment_size)
        return dict(audio=audio_m.astype(np.float32), code=code_m,
                    f0=f0_m[None].astype(np.float32),
                    mel=mel_m.astype(np.float32), emb=emb,
                    spkr=np.array([spkr], np.int64))

    def _load_item(self, idx: int) -> dict:
        if self._cache_dir is None:
            return self._preprocess(idx)
        os.makedirs(self._cache_dir, exist_ok=True)
        path = Path(self._cache_dir, self._item_key(idx) + ".npz")
        if path.exists():
            with np.load(path) as z:
                return {k: z[k] for k in z.files}
        item = self._preprocess(idx)
        np.savez(path, **item)
        return item

    # ---- batching ---------------------------------------------------------

    def __len__(self) -> int:
        return len(self.files)

    def __getitem__(self, idx: int):
        return self.items[idx]

    def clip(self, idx: int, rng: np.random.Generator) -> dict:
        cfg = self.cfg
        it = self.items[idx]
        audio, code, f0, mel = clip_segment_random(
            [(it["audio"], 1), (it["code"], cfg.code_hop_size),
             (it["f0"], cfg.f0_hop), (it["mel"], cfg.mel.hop_size)],
            cfg.segment_size, rng)
        return dict(audio=audio[None], code=code, f0=f0, mel_loss=mel,
                    emb=it["emb"], spkr=it["spkr"])

    def batches(self, batch_size: int, *, epoch: int = 0, seed: int = 1234,
                shuffle: bool = True, drop_last: bool = True
                ) -> Iterator[dict]:
        rng = np.random.default_rng(np.random.SeedSequence([seed, epoch]))
        order = rng.permutation(len(self)) if shuffle else np.arange(len(self))
        end = (len(order) // batch_size) * batch_size if drop_last \
            else len(order)
        for s in range(0, end, batch_size):
            items = [self.clip(i, rng) for i in order[s:s + batch_size]]
            yield {k: np.stack([it[k] for it in items]).astype(
                np.int32 if k in ("code", "spkr") else np.float32)
                for k in items[0]}


class F0DatasetTPU:
    """F0Dataset (I_da/src/dataset.py:452-545): f0-only random clips for the
    VQVAE trainer; f0 hop 80 samples (5 ms), segments in sample scale."""

    def __init__(self, files: Sequence, *, segment_size: int = 16640,
                 f0_cfg: F0Config = F0Config(), f0_normalize: bool = True,
                 f0_stats: Optional[Dict] = None,
                 cache_dir: Optional[str] = None):
        self.files = [str(f) for f in files]
        self.segment_size = segment_size
        self.f0_cfg = f0_cfg
        self.hop = f0_cfg.hop
        self.f0s: List[np.ndarray] = []
        for f in self.files:
            cached = None
            if cache_dir:
                os.makedirs(cache_dir, exist_ok=True)
                key = hashlib.sha256(
                    (f + str(segment_size)).encode()).hexdigest()[:20]
                p = Path(cache_dir, f"f0_{key}.npy")
                cached = np.load(p) if p.exists() else None
            if cached is None:
                wav, _ = load_wav(f, target_sr=f0_cfg.sr)
                f0 = _extract_f0_bucketed(peak_normalize(wav, 0.95), f0_cfg)
                if f0_normalize:
                    stats = f0_stats or {}
                    voiced = f0[f0 > 0]
                    mean = stats.get("f0_mean",
                                     float(voiced.mean()) if voiced.size
                                     else 0.0)
                    std = stats.get("f0_std",
                                    float(voiced.std()) if voiced.size
                                    else 1.0)
                    f0 = np.asarray(normalize_nonzero(f0, mean,
                                                      max(std, 1e-8)))
                cached = f0.astype(np.float32)
                if cache_dir:
                    np.save(p, cached)
            (f0_m,) = match_length([(cached, self.hop)],
                                   min_length=segment_size)
            self.f0s.append(f0_m)

    def __len__(self) -> int:
        return len(self.files)

    def batches(self, batch_size: int, *, epoch: int = 0, seed: int = 1234,
                shuffle: bool = True) -> Iterator[dict]:
        rng = np.random.default_rng(np.random.SeedSequence([seed, epoch]))
        order = rng.permutation(len(self)) if shuffle else np.arange(len(self))
        end = (len(order) // batch_size) * batch_size
        for s in range(0, end, batch_size):
            clips = [clip_segment_random([(self.f0s[i], self.hop)],
                                         self.segment_size, rng)[0]
                     for i in order[s:s + batch_size]]
            yield {"f0": np.stack(clips)[:, None, :].astype(np.float32)}
