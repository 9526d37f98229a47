"""ASR-baseline DSP chain tests: energy VAD, MFCC, DTW, WSOLA, crossfade
paste, and the full splice pipeline (predict_asr.py:64-265 behaviors)."""
import numpy as np
import pytest

from speech_inpainting_tpu.infer.asr_baseline import (ASRBaselineConfig,
                                                      asr_tts_baseline,
                                                      asr_tts_inpaint)
from speech_inpainting_tpu.ops.dsp import (crossfade_paste, dtw, energy_vad,
                                           map_time, melspectrogram, mfcc,
                                           speech_bounds, stft_mag, wsola)

SR = 16000


def speechish(dur_s, f0=120.0, sr=SR, seed=0):
    """Harmonic-rich signal with an amplitude envelope (speech stand-in)."""
    t = np.arange(int(dur_s * sr)) / sr
    rng = np.random.default_rng(seed)
    y = sum(np.sin(2 * np.pi * f0 * k * t + rng.uniform(0, 6)) / k
            for k in range(1, 6))
    env = 0.5 + 0.5 * np.sin(2 * np.pi * 1.3 * t + 1.0)
    return (0.3 * y * env).astype(np.float32)


# ----------------------------------------------------------------- VAD
def test_energy_vad_bounds():
    sil = np.zeros(SR // 2, np.float32)             # 0.5 s silence
    y = np.concatenate([sil, speechish(1.0), sil])
    va = energy_vad(y, SR)
    first, last = speech_bounds(va, SR)
    assert abs(first - SR // 2) < 0.06 * SR          # within 3 frames
    assert abs(last - (SR // 2 + SR)) < 0.06 * SR
    assert speech_bounds(energy_vad(np.zeros(SR, np.float32), SR), SR) == \
        (0, 0)


# ---------------------------------------------------------------- MFCC
def test_stft_matches_torch():
    import torch
    y = speechish(0.5)
    got = stft_mag(y, n_fft=512, hop=160)
    want = torch.stft(torch.from_numpy(y), n_fft=512, hop_length=160,
                      window=torch.hann_window(512, periodic=True),
                      center=True, pad_mode="reflect",
                      return_complex=True).abs().numpy()
    m = min(got.shape[1], want.shape[1])
    np.testing.assert_allclose(got[:, :m], want[:, :m], atol=1e-4)


def test_mfcc_shapes_and_dc():
    y = speechish(0.5)
    M = mfcc(y, SR, hop=160)
    assert M.shape[0] == 20
    assert M.shape[1] == 1 + len(y) // 160
    # c0 of the all-ones dB mel is the (scaled) mean → louder signal, higher c0
    M2 = mfcc(4 * y, SR, hop=160)
    assert M2[0].mean() > M[0].mean()


def test_melspectrogram_nonnegative():
    S = melspectrogram(speechish(0.3), SR, hop=160)
    assert S.shape[0] == 128 and (S >= 0).all()


# ----------------------------------------------------------------- DTW
def test_dtw_identity_is_diagonal():
    X = np.random.default_rng(0).standard_normal((4, 30))
    D, path = dtw(X, X)
    assert path[0].tolist() == [29, 29] and path[-1].tolist() == [0, 0]
    np.testing.assert_array_equal(path[::-1], np.stack([np.arange(30)] * 2,
                                                       axis=1))
    assert D[29, 29] == pytest.approx(0.0, abs=1e-6)


def test_dtw_recovers_time_shift():
    """Y = X slowed 1.5x: the path maps t_src ≈ t_tgt/1.5. Features are a
    smooth non-periodic random walk — unambiguous matches."""
    rng = np.random.default_rng(3)
    X = np.cumsum(rng.standard_normal((4, 60)), axis=1)
    Y = X[:, (np.arange(90) / 1.5).astype(int)]
    _, path = dtw(X, Y)
    t = map_time(path, 30 * 160 / SR, 160, SR)
    assert abs(t - 45 * 160 / SR) < 6 * 160 / SR


def test_dtw_unreachable_end_raises():
    """Exact 2x length ratio is outside the {(1,1),(2,1),(1,2)} step cone
    (librosa.sequence.dtw shares this constraint)."""
    X = np.cumsum(np.random.default_rng(0).standard_normal((2, 20)), axis=1)
    with pytest.raises(ValueError, match="unreachable"):
        dtw(X, np.repeat(X, 2, axis=1))


def test_dtw_cost_vs_bruteforce_tiny():
    rng = np.random.default_rng(1)
    X, Y = rng.standard_normal((2, 5)), rng.standard_normal((2, 6))
    D, _ = dtw(X, Y)
    # brute force over all monotone step sequences via DP with same steps
    C = np.sqrt(((X.T[:, None, :] - Y.T[None, :, :]) ** 2).sum(-1))
    ref = np.full((5, 6), np.inf)
    ref[0, 0] = C[0, 0]
    for i in range(5):
        for j in range(6):
            for di, dj in ((1, 1), (2, 1), (1, 2)):
                if i - di >= 0 and j - dj >= 0:
                    ref[i, j] = min(ref[i, j], ref[i - di, j - dj] + C[i, j])
    np.testing.assert_allclose(D, ref)


# --------------------------------------------------------------- WSOLA
@pytest.mark.parametrize("alpha", [0.7, 1.0, 1.5, 2.0])
def test_wsola_length_and_pitch(alpha):
    sr = SR
    t = np.arange(sr) / sr
    y = np.sin(2 * np.pi * 220 * t).astype(np.float32)
    out = wsola(y, alpha)
    assert abs(len(out) - alpha * len(y)) <= 1
    # pitch preserved: zero-crossing rate unchanged (vs resampling, which
    # would scale it by 1/alpha)
    zcr = lambda x: np.mean(np.abs(np.diff(np.signbit(  # noqa: E731
        x[len(x) // 4:-len(x) // 4 or None]))))
    assert zcr(out) == pytest.approx(zcr(y), rel=0.05)
    # amplitude preserved (overlap-add normalization)
    assert np.percentile(np.abs(out), 95) == pytest.approx(
        np.percentile(np.abs(y), 95), rel=0.15)


# ----------------------------------------------------- crossfade paste
def test_crossfade_paste_formula():
    sr = SR
    y = np.ones(sr, np.float32)
    y[4000:8000] = 0.0                       # the mask
    patch = np.full(4000, 2.0, np.float32)
    out = crossfade_paste(y, patch, 4000, 8000, sr, crossfade_s=0.01)
    c = int(0.01 * sr)
    # strictly inside the mask (past the fades): pure patch
    assert out[4000 + c] == pytest.approx(2.0)
    # strictly outside: original
    assert out[2000] == pytest.approx(1.0) and out[12000] == pytest.approx(1.0)
    # reference fade arithmetic (predict_asr.py:218-228): the patch starts
    # exactly at mask start, so on [start-c/2, start) only the fading-out
    # original contributes; on [start, start+c/2) the masked original is 0
    # and the fading-in patch carries the blend
    assert out[3960] == pytest.approx(0.75 * 1.0, rel=2e-2)
    assert out[4000] == pytest.approx(0.5 * 2.0, rel=2e-2)
    assert out[4040] == pytest.approx(0.75 * 2.0, rel=2e-2)
    assert out[7960] == pytest.approx(0.75 * 2.0, rel=2e-2)
    assert out[8040] == pytest.approx(0.75 * 1.0, rel=2e-2)


# ------------------------------------------------------- full pipeline
def test_asr_tts_inpaint_end_to_end():
    """Mask a span; 'TTS' output = a slowed copy of the clean signal. The
    pipeline must locate the matching span via DTW, stretch it back, and
    paste it — recovering signal energy inside the mask."""
    sil = np.zeros(4000, np.float32)
    clean = np.concatenate([sil, speechish(2.0, f0=130), sil])
    mask_s = (1.0, 1.2)
    masked = clean.copy()
    masked[int(mask_s[0] * SR):int(mask_s[1] * SR)] = 0.0
    # synthetic = clean stretched 1.3x (a TTS would give different timing)
    synth = wsola(clean, 1.3).astype(np.float32)

    out = asr_tts_inpaint(masked, synth, mask_s)
    inp = out["inpainted"]
    # locate the mask on the cropped grid: crop shifted mask by `first`
    va = energy_vad(masked, SR)
    first, _ = speech_bounds(va, SR)
    s = int(mask_s[0] * SR) - first
    e = int(mask_s[1] * SR) - first
    seg = inp[s + 200:e - 200]
    masked_seg_rms = 0.0                      # masked input was zeros there
    rms = float(np.sqrt(np.mean(seg ** 2)))
    clean_rms = float(np.sqrt(np.mean(
        clean[int(mask_s[0] * SR) + 200:int(mask_s[1] * SR) - 200] ** 2)))
    assert rms > 0.25 * clean_rms > masked_seg_rms
    # outside the mask the signal is untouched (modulo crossfade edges)
    np.testing.assert_allclose(inp[:s - 200], masked[first:first + s - 200],
                               atol=1e-6)
    assert out["inpainted_with_silence"].shape == masked.shape


def test_asr_tts_baseline_pluggable():
    clean = speechish(1.0)
    masked = clean.copy()
    masked[8000:9600] = 0
    calls = {}

    def fake_asr(y):
        calls["asr"] = True
        return "hello"

    def fake_tts(text, spk):
        calls["tts"] = text
        return clean

    out = asr_tts_baseline(masked, (0.5, 0.6), asr=fake_asr, tts=fake_tts,
                           cfg=ASRBaselineConfig(crop_silence=False))
    assert calls == {"asr": True, "tts": "hello"}
    assert out["transcript"] == "hello"
    assert len(out["inpainted"]) == len(masked)


def test_dtw_vectorized_matches_percell_dp(rng):
    """The row-vectorized DP (all steps advance i) must reproduce the
    per-cell reference recursion exactly — costs, tie-breaks, and path."""
    def percell(C, step_sizes, weights):
        N, M = C.shape
        D = np.full((N, M), np.inf)
        steps = np.full((N, M), -1, np.int32)
        D[0, 0] = C[0, 0]
        for i in range(N):
            for j in range(M):
                if i == 0 and j == 0:
                    continue
                best, arg = np.inf, -1
                for k, ((di, dj), w) in enumerate(zip(step_sizes, weights)):
                    pi, pj = i - di, j - dj
                    if pi >= 0 and pj >= 0 and D[pi, pj] + w * C[i, j] < best:
                        best, arg = D[pi, pj] + w * C[i, j], k
                D[i, j] = best
                steps[i, j] = arg
        return D, steps

    steps = ((1, 1), (2, 1), (1, 2))
    for trial in range(3):
        X = rng.standard_normal((6, 30 + trial))
        Y = rng.standard_normal((6, 41 + 2 * trial))
        D, path = dtw(X, Y, step_sizes=steps)
        C = np.sqrt(np.maximum(
            (X * X).sum(0)[:, None] - 2.0 * (X.T @ Y)
            + (Y * Y).sum(0)[None, :], 0.0))
        D_ref, _ = percell(C, steps, (1.0, 1.0, 1.0))
        fin = np.isfinite(D_ref)
        np.testing.assert_allclose(D[fin], D_ref[fin], rtol=1e-12)
        assert (~np.isfinite(D[~fin])).all()
        assert path[0].tolist() == [X.shape[1] - 1, Y.shape[1] - 1]
        assert path[-1].tolist() == [0, 0]


def test_wsola_large_stretch_and_bad_alpha(rng):
    """Stretch factors above 2x previously crashed on truncated slices
    (under-padded natural-continuation reads); non-positive alpha must be a
    clear error, not NaN frame positions."""
    import pytest
    x = np.sin(np.arange(16000) / 20).astype(np.float32)
    for alpha in (2.5, 7.0, 0.3):
        out = wsola(x[:4000] if alpha > 5 else x, alpha)
        assert np.isfinite(out).all() and len(out) > 0
    with pytest.raises(ValueError, match="positive"):
        wsola(x, 0.0)


def test_crossfade_paste_signal_edges():
    """Fades are clipped at the signal boundaries (previously a broadcast
    crash), and out-of-range spans are clamped."""
    y = np.ones(16000, np.float32)
    patch = np.full(160, 0.5, np.float32)
    for start, end in [(15990, 16090), (2, 100), (-50, 100), (16000, 16200)]:
        out = crossfade_paste(y, patch, start, end, 16000, 0.01)
        assert out.shape == y.shape and np.isfinite(out).all()


def test_asr_baseline_mask_outside_speech(rng):
    """A mask entirely inside the VAD-cropped silence returns the signal
    unchanged instead of dividing by a zero-length span."""
    from speech_inpainting_tpu.infer.asr_baseline import asr_tts_inpaint
    t = np.arange(16000 * 2)
    speech = (0.3 * np.sin(2 * np.pi * 220 * t / 16000)).astype(np.float32)
    y = np.concatenate([speech, np.zeros(16000, np.float32)])  # 1s tail
    out = asr_tts_inpaint(y, y.copy(), (2.5, 2.7))  # mask in the silence
    assert len(out["patch"]) == 0
    assert np.isfinite(out["inpainted"]).all()
    np.testing.assert_array_equal(out["inpainted_with_silence"], y)
