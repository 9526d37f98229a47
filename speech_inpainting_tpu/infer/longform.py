"""Long-form informed inpainting: windowed streaming over arbitrary-length audio.

The reference operates on single short utterances only — `I_ea/predict.py:79-82`
loads the whole wav into one forward, capped by the processor's
`max_wav_length` (5 s, `I_ea/config.yaml:11`); the only long-input mechanism
anywhere is the feature reader's sequential 100 s chunking
(`I_da/src/hubert_feature_reader.py:57-67`). Inpainting a long recording
(podcast, meeting, archive restoration) is out of its reach.

This module extends the informed-inpainting protocol to unbounded-length
audio the TPU-native way: ONE static window shape (so one compile, ever),
masks mapped onto frame-aligned windows, windows batched and pipelined
through the fused `InformedInpainter` graph, and only the resynthesized mask
spans crossfade-pasted back into the untouched original waveform.

Why paste-back instead of vocoding everything: outside the masks the original
signal is already perfect — re-synthesizing it could only lose quality, and
the device work scales with the number of masks, not the recording length.
A 1 h recording with ten 200 ms dropouts costs ten windows, not 3600 s of
vocoding.

Scale handling: the graph peak-normalizes each masked window to 0.95 inf-norm
before the mel (matching `predict.py:104`), so the vocoded patch lives at the
window's normalized level; the paste rescales by the exact inverse gain to
restore the recording's native level.

Frame conventions are global 20 ms frames (hop 441 @ 22.05 kHz == hop 320
@ 16 kHz); window starts are frame-aligned so the in-window mask arithmetic
(`predict.py:99-104,133`) is unchanged, with the window's HuBERT context
standing in for the full utterance's.
"""
from __future__ import annotations

import dataclasses

import numpy as np

from .serving import PipelinedRunner

S22, S16 = 441, 320        # samples per 20 ms frame at 22.05 k / 16 k


@dataclasses.dataclass(frozen=True)
class LongFormConfig:
    window_frames: int = 200    # 4.0 s context per mask; ONE compile per value
    batch: int = 8              # windows per device dispatch (static)
    depth: int = 4              # pipelined batches in flight
    crossfade_s: float = 0.01   # paste crossfade (predict_asr.py uses 10 ms)
    margin_frames: int = 2      # keep masks this far from window edges


def plan_windows(total_frames: int, mask_pos, mask_len, window_frames: int,
                 margin: int = 2):
    """Map global-frame masks onto frame-aligned windows.

    Returns (win_start, rel_pos) int arrays: window w covers global frames
    [win_start, win_start + window_frames) and the mask sits at rel_pos
    inside it, centered when possible, clamped at recording edges. Masks must
    fit: mask_len <= window_frames - 2*margin (recordings shorter than one
    window are zero-padded by the caller, not here).
    """
    mask_pos = np.asarray(mask_pos, np.int64)
    mask_len = np.asarray(mask_len, np.int64)
    if mask_pos.ndim != 1 or mask_pos.shape != mask_len.shape:
        raise ValueError("mask_pos/mask_len must be equal-length 1-D arrays")
    if np.any(mask_len < 1):
        raise ValueError("mask_len must be >= 1 frame")
    if np.any(mask_len > window_frames - 2 * margin):
        raise ValueError(
            f"mask_len {int(mask_len.max())} exceeds window capacity "
            f"{window_frames - 2 * margin} (window {window_frames} frames, "
            f"margin {margin}); raise LongFormConfig.window_frames")
    if np.any(mask_pos < 0) or np.any(mask_pos + mask_len > total_frames):
        raise ValueError("mask spans must lie inside the recording")
    center = mask_pos + mask_len // 2
    hi = max(total_frames - window_frames, 0)
    win_start = np.clip(center - window_frames // 2, 0, hi)
    # edge clamp can push the mask into the margin; pull the window back
    win_start = np.minimum(win_start, np.maximum(mask_pos - margin, 0))
    win_start = np.maximum(win_start,
                           np.minimum(mask_pos + mask_len + margin,
                                      total_frames) - window_frames)
    win_start = np.clip(win_start, 0, hi)
    rel = mask_pos - win_start
    return win_start.astype(np.int64), rel.astype(np.int64)


def merge_mask_spans(mask_pos, mask_len, *, gap_frames: int = 2):
    """Coalesce masks whose spans touch or sit within `gap_frames` of each
    other into single spans. Two reasons (both bite with multi-mask
    long-form inputs): (a) each window's paste covers a 1-frame margin
    around its mask, so adjacent masks' patches would overwrite each
    other's inpainted output; (b) a 400 ms dropout split into two --mask
    flags should behave like one mask, not two half-informed ones."""
    pos = np.asarray(mask_pos, np.int64)
    ln = np.asarray(mask_len, np.int64)
    if len(pos) <= 1:
        return pos, ln
    o = np.argsort(pos)
    pos, ln = pos[o], ln[o]
    out_p, out_l = [int(pos[0])], [int(ln[0])]
    for p, l in zip(pos[1:], ln[1:]):
        if p <= out_p[-1] + out_l[-1] + gap_frames:
            out_l[-1] = max(out_p[-1] + out_l[-1], int(p + l)) - out_p[-1]
        else:
            out_p.append(int(p))
            out_l.append(int(l))
    return np.asarray(out_p, np.int64), np.asarray(out_l, np.int64)


def _crossfade_paste(y: np.ndarray, patch: np.ndarray, start: int,
                     fade: int, *, fade_in: bool = True,
                     fade_out: bool = True) -> None:
    """In-place paste of `patch` at y[start:start+len(patch)] with
    complementary linear ramps over the first/last `fade` samples (both
    signals live across the fade — no energy dip, unlike the ASR baseline's
    mask-bounded paste in ops/dsp.py:crossfade_paste which mirrors
    predict_asr.py:215-231). fade_in/fade_out=False suppresses a ramp —
    used when the patch has no clean margin on that side (mask at the
    recording edge), where ramping would mix corrupted samples back in."""
    n = len(patch)
    lo, hi = max(start, 0), min(start + n, len(y))
    if hi <= lo:
        return
    seg = patch[lo - start:hi - start].astype(np.float64)
    w = np.ones(n, np.float64)
    f = min(fade, n // 2)
    if f > 0:
        ramp = np.linspace(0.0, 1.0, f + 2)[1:-1]
        if fade_in:
            w[:f] = ramp
        if fade_out:
            w[-f:] = ramp[::-1]
    w = w[lo - start:hi - start]
    y[lo:hi] = (y[lo:hi] * (1.0 - w) + seg * w).astype(y.dtype)


class LongFormInpainter:
    """Windowed informed inpainting over arbitrary-length recordings.

    inpainter: an `InformedInpainter` (any engine/vocoder family); its graph
        compiles once for the (window22, window16) shapes below.
    cfg: window/batch/pipeline geometry.

    Call with the full-length 22.05 k and 16 k waveforms and the masks on the
    global 20 ms frame grid; returns the inpainted 22.05 k waveform (a copy —
    the input is never modified) plus per-mask patch spans.
    """

    def __init__(self, inpainter, cfg: LongFormConfig = LongFormConfig()):
        assert cfg.window_frames > 2 * cfg.margin_frames > 0
        assert cfg.batch >= 1 and cfg.depth >= 1
        self.cfg = cfg
        self._inp = inpainter

    def __call__(self, wav22, wav16, mask_pos, mask_len):
        cfg = self.cfg
        wav22 = np.asarray(wav22, np.float32)
        wav16 = np.asarray(wav16, np.float32)
        out = wav22.copy()
        Wf, mg = cfg.window_frames, cfg.margin_frames
        total = min(len(wav22) // S22, len(wav16) // S16)
        # tail pad by `margin` frames (plus up to a full window for short
        # recordings) so a mask ending at the recording edge still sits
        # `margin` frames inside its window — zero context past the end,
        # exactly the reference's zero-pad-to-max_len behavior
        # (I_ea/dataset/dataset.py:49-63)
        padded = max(total + mg, Wf)
        wav22 = np.pad(wav22, (0, max(padded * S22 - len(wav22), 0)))
        wav16 = np.pad(wav16, (0, max(padded * S16 - len(wav16), 0)))
        if np.any(np.asarray(mask_pos) + np.asarray(mask_len) > total):
            raise ValueError("mask spans must lie inside the recording")
        # near-adjacent masks coalesce so their paste margins can't
        # overwrite each other's inpainted output (see merge_mask_spans)
        mask_pos, mask_len = merge_mask_spans(mask_pos, mask_len)
        win_start, rel = plan_windows(padded, mask_pos, mask_len, Wf, mg)
        M, B = len(win_start), cfg.batch

        def window_batch(i0):
            idx = [min(i0 + j, M - 1) for j in range(B)]   # pad by repeat
            w22 = np.stack([wav22[win_start[i] * S22:
                                  (win_start[i] + Wf) * S22] for i in idx])
            w16 = np.stack([wav16[win_start[i] * S16:
                                  (win_start[i] + Wf) * S16] for i in idx])
            # OTHER masks' spans are corrupt too — zero any that intersect
            # this window so they are never fed to HuBERT/the vocoder as
            # clean context (the graph zeroes only the window's OWN span)
            for j, i in enumerate(idx):
                for k in range(M):
                    if k == i:
                        continue
                    a = max(int(mask_pos[k]) - int(win_start[i]), 0)
                    b = min(int(mask_pos[k] + mask_len[k])
                            - int(win_start[i]), Wf)
                    if b > a:
                        w22[j, a * S22:b * S22] = 0.0
                        w16[j, a * S16:b * S16] = 0.0
            # inverse of the graph's peak_normalize on the MASKED window
            gains = []
            for j, i in enumerate(idx):
                m = w22[j].copy()
                m[rel[i] * S22:(rel[i] + mask_len[i]) * S22] = 0.0
                gains.append(max(float(np.abs(m).max()), 1e-10) / 0.95)
            return (w22, w16, rel[idx].astype(np.int32),
                    mask_len[idx].astype(np.int32)), np.asarray(gains)

        import jax
        runner = PipelinedRunner(
            lambda *a: self._inp.batch(*a)["inpainted"],
            depth=cfg.depth, fetch=jax.device_get)
        fade = int(cfg.crossfade_s * 22050)
        spans = []

        def paste(done, i0, gains):
            for j in range(B):
                i = i0 + j
                if i >= M:
                    break
                lead = int(min(rel[i], 1))                 # ≤1 frame margin
                a = int((rel[i] - lead) * S22)
                b_full = int((rel[i] + mask_len[i] + 1) * S22)
                b = min(b_full, done.shape[1])
                patch = done[j, a:b].astype(np.float64) * gains[j]
                start = int(win_start[i] * S22 + a)
                # no clean margin on a side -> no ramp there (a ramp would
                # mix the corrupted original back into the mask span)
                _crossfade_paste(out, patch, start, fade,
                                 fade_in=lead > 0, fade_out=b == b_full)
                spans.append((start, min(start + (b - a), len(out))))

        starts = list(range(0, M, B))
        all_gains = []
        done_i = 0
        for i0 in starts:
            args, gains = window_batch(i0)
            all_gains.append(gains)
            for done in runner.submit(*args):
                paste(done, starts[done_i], all_gains[done_i]); done_i += 1
        for done in runner.drain():
            paste(done, starts[done_i], all_gains[done_i]); done_i += 1
        return out, spans


__all__ = ["LongFormConfig", "LongFormInpainter", "merge_mask_spans",
           "plan_windows"]
