"""Metrics tests: SI-SDR/log-spectral formula parity with the reference,
WER/CER edit distances, and STOI/ESTOI sanity (monotonic in SNR, ~1 on
identity)."""
import numpy as np
import pytest

from speech_inpainting_tpu.metrics.objective import (avg_cosine_sim, cer,
                                                     log_spectral_d2,
                                                     log_spectral_rmse,
                                                     normalize_text, si_sdr,
                                                     wer)
from speech_inpainting_tpu.metrics.stoi import stoi


def test_si_sdr_matches_reference_formula(rng):
    ref = rng.standard_normal(8000).astype(np.float32)
    est = ref + 0.1 * rng.standard_normal(8000).astype(np.float32)
    # reference sisdr (metrics.py:127-142) re-evaluated inline
    eps = np.finfo(est.dtype).eps
    r = ref.reshape(-1, 1)
    e = est.reshape(-1, 1)
    a = (eps + r.T @ e) / (r.T @ r + eps)
    e_true = a * r
    e_res = e - e_true
    want = 10 * np.log10((eps + (e_true ** 2).sum())
                         / (eps + (e_res ** 2).sum()))
    np.testing.assert_allclose(si_sdr(est, ref), float(want), rtol=1e-6)
    # invariance to scaling of the estimate
    np.testing.assert_allclose(si_sdr(3.0 * est, ref), si_sdr(est, ref),
                               rtol=1e-5)


def test_log_spectral_formulas(rng):
    a = rng.standard_normal((50, 80))
    b = a + 0.1 * rng.standard_normal((50, 80))
    scale = 20 / np.log(10)
    ac = a - a.mean(0)
    bc = b - b.mean(0)
    want_rmse = scale * np.sqrt(np.mean((ac - bc) ** 2))
    want_d2 = (scale * np.sqrt(np.mean((ac - bc) ** 2, axis=0))).mean()
    np.testing.assert_allclose(log_spectral_rmse(a, b), want_rmse, rtol=1e-6)
    np.testing.assert_allclose(log_spectral_d2(a, b), want_d2, rtol=1e-6)
    assert log_spectral_rmse(a, a) == 0.0


def test_avg_cosine_sim(rng):
    center = rng.standard_normal(8)
    a = rng.standard_normal((5, 8))
    assert avg_cosine_sim(a, a, center) == pytest.approx(1.0)
    assert avg_cosine_sim(a, 2 * center - a, center) == pytest.approx(-1.0)


def test_wer_cer():
    assert wer("the cat sat", "the cat sat") == 0.0
    assert wer("the cat sat", "the bat sat") == pytest.approx(1 / 3)
    assert wer("a b c d", "a b") == pytest.approx(0.5)
    assert cer("abc", "abd") == pytest.approx(1 / 3)
    # normalization: case + punctuation stripped (reference preprocess_text)
    assert wer("The cat, sat!", "the cat sat") == 0.0
    assert normalize_text("Hello, World!") == "hello world"


def speechy(rng, seconds=2.0, sr=10000):
    """Speech-shaped test signal: 4 Hz-modulated pink noise (fills every
    third-octave band with coherent envelope structure)."""
    n = int(sr * seconds)
    spec = np.fft.rfft(rng.standard_normal(n))
    f = np.fft.rfftfreq(n, 1 / sr)
    spec[1:] /= np.sqrt(f[1:])          # 1/f power: pink
    sig = np.fft.irfft(spec, n)
    t = np.arange(n) / sr
    env = 0.5 * (1 + np.sin(2 * np.pi * 4 * t)) + 0.05
    sig = env * sig
    return (sig / np.abs(sig).max()).astype(np.float64)


@pytest.mark.parametrize("extended", [False, True], ids=["stoi", "estoi"])
def test_stoi_identity_and_monotonic(rng, extended):
    x = speechy(rng)
    clean = stoi(x, x, 10000, extended=extended)
    assert clean > 0.98

    scores = []
    for snr_db in (20, 5, -5):
        noise = rng.standard_normal(len(x))
        noise *= np.linalg.norm(x) / np.linalg.norm(noise) / 10 ** (snr_db / 20)
        scores.append(stoi(x, x + noise, 10000, extended=extended))
    assert scores[0] > scores[1] > scores[2]
    assert scores[0] > 0.7 and scores[2] < 0.55


def test_stoi_resamples_other_rates(rng):
    x = speechy(rng, sr=10000)
    from scipy.signal import resample_poly
    x16 = resample_poly(x, 16000, 10000)
    s = stoi(x16, x16, 16000, extended=True)
    assert s > 0.98


def test_stoi_too_short_raises(rng):
    with pytest.raises(ValueError):
        stoi(np.zeros(100), np.zeros(100), 10000)


def test_pesq_monotonic_and_calibrated(rng):
    from speech_inpainting_tpu.metrics.pesq import pesq
    from speech_inpainting_tpu.data.audio import load_wav
    wav, sr = load_wav(
        "/root/reference/I_ea/hifi_gan/test_files/LJ001-0001_16k.wav")
    wav = wav[:16000 * 3]
    assert pesq(wav, wav, sr) > 4.6                 # identity at WB ceiling
    assert pesq(wav, 0.3 * wav, sr) > 4.6           # level-aligned

    scores = []
    for snr in (40, 20, 10, 0):
        n = rng.standard_normal(len(wav))
        n *= np.linalg.norm(wav) / np.linalg.norm(n) / 10 ** (snr / 20)
        scores.append(pesq(wav, wav + n, sr))
    assert scores[0] > scores[1] > scores[2] > scores[3]
    # published P.862 white-noise anchors ±0.35 MOS (VERDICT r2 #6):
    # 20 dB ≈ 2.9, 10 dB ≈ 1.8-2.2, 0 dB ≈ 1.2-1.5
    assert scores[0] > 4.0
    assert 2.55 < scores[1] < 3.25
    assert 1.60 < scores[2] < 2.35
    assert 1.15 < scores[3] < 1.70

    # muffling (lowpass) must also hurt
    from scipy.signal import butter, lfilter
    b, a = butter(4, 1500 / (sr / 2))
    assert pesq(wav, lfilter(b, a, wav), sr) < 3.5

    with pytest.raises(ValueError):
        pesq(np.zeros(100), np.zeros(100), 16000)


def test_pesq_degradation_families(rng):
    """Anchor tests beyond white noise (VERDICT r1 #8): temporal shift
    (exercises the constant-delay alignment), clipping, band-limiting —
    with cross-metric monotonicity against STOI. Values pin the measured
    validity envelope documented in metrics/pesq.py."""
    from scipy.signal import butter, lfilter

    from speech_inpainting_tpu.data.audio import load_wav
    from speech_inpainting_tpu.metrics.pesq import pesq
    from speech_inpainting_tpu.metrics.stoi import stoi

    wav, sr = load_wav(
        "/root/reference/I_ea/hifi_gan/test_files/LJ001-0001_16k.wav")
    wav = wav[:16000 * 4]

    # constant delay is compensated (certified PESQ aligns too): near ceiling
    for ms in (5, 20, 50):
        deg = np.concatenate([np.zeros(sr * ms // 1000), wav])[:len(wav)]
        assert pesq(wav, deg, sr) > 4.4, f"shift {ms}ms"

    # clipping: monotone, and agrees with STOI's ordering
    peaks = (0.5, 0.25, 0.1, 0.05)
    p_scores = [pesq(wav, np.clip(wav, -f * np.abs(wav).max(),
                                  f * np.abs(wav).max()), sr)
                for f in peaks]
    s_scores = [stoi(wav, np.clip(wav, -f * np.abs(wav).max(),
                                  f * np.abs(wav).max()), sr)
                for f in peaks]
    assert all(a > b for a, b in zip(p_scores, p_scores[1:])), p_scores
    assert all(a > b for a, b in zip(s_scores, s_scores[1:])), s_scores
    assert 4.0 < p_scores[0] < 4.64 and p_scores[-1] < 2.3

    # band-limiting: monotone with cutoff, and mild highpass barely hurts
    cuts = (7000, 4000, 2000, 1000)
    lp = []
    for fc in cuts:
        b, a = butter(6, fc / (sr / 2))
        lp.append(pesq(wav, lfilter(b, a, wav), sr))
    assert all(x > y for x, y in zip(lp, lp[1:])), lp
    assert lp[0] > 4.2 and 2.3 < lp[2] < 3.3       # 2 kHz ~ published 2.5-3
    b, a = butter(4, 100 / (sr / 2), btype="high")
    assert pesq(wav, lfilter(b, a, wav), sr) > 4.5
