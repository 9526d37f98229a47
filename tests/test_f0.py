"""f0 tracker tests: accuracy on synthetic tones, voicing decisions,
normalization semantics, and statistics."""
import numpy as np

import jax.numpy as jnp

from speech_inpainting_tpu.ops.f0 import (F0Config, extract_f0,
                                          f0_statistics, normalize_nonzero)

CFG = F0Config()


def tone(freq, seconds=0.5, sr=16000, kind="saw"):
    t = np.arange(int(sr * seconds)) / sr
    if kind == "sine":
        return np.sin(2 * np.pi * freq * t).astype(np.float32)
    # sawtooth: rich harmonics, closer to glottal pulses
    return (2 * ((freq * t) % 1.0) - 1.0).astype(np.float32) * 0.5


def test_f0_accuracy_on_tones():
    for freq in (100.0, 150.0, 220.0, 330.0):
        f0 = np.asarray(extract_f0(tone(freq)))
        voiced = f0[f0 > 0]
        assert len(voiced) > 0.8 * len(f0), freq
        err = np.abs(np.median(voiced) - freq) / freq
        assert err < 0.02, (freq, np.median(voiced))


def test_f0_silence_is_unvoiced():
    f0 = np.asarray(extract_f0(np.zeros(8000, np.float32)))
    assert (f0 == 0).all()


def test_f0_noise_mostly_unvoiced(rng):
    f0 = np.asarray(extract_f0(
        rng.standard_normal(8000).astype(np.float32) * 0.1))
    assert (f0 == 0).mean() > 0.5


def test_f0_voiced_unvoiced_boundary():
    sig = np.concatenate([tone(150, 0.3), np.zeros(4800, np.float32),
                          tone(150, 0.3)])
    f0 = np.asarray(extract_f0(sig))
    n = len(f0)
    mid = f0[int(n * 0.42):int(n * 0.58)]
    assert (mid == 0).mean() > 0.7
    head = f0[2:int(n * 0.25)]
    assert (head > 0).mean() > 0.7


def test_f0_frame_rate_and_batch():
    sig = tone(200, 1.0)
    f0 = np.asarray(extract_f0(sig))
    assert abs(len(f0) - CFG.num_frames(len(sig))) == 0
    # 5 ms hop → ~200 frames/s
    assert 170 <= len(f0) <= 205
    batch = np.stack([sig, tone(120, 1.0)])
    f2 = np.asarray(extract_f0(batch))
    assert f2.shape == (2, len(f0))
    assert abs(np.median(f2[1][f2[1] > 0]) - 120) < 5


def test_normalize_nonzero():
    f0 = np.array([0.0, 100.0, 200.0, 0.0], np.float32)
    out = np.asarray(normalize_nonzero(jnp.asarray(f0), 150.0, 50.0))
    np.testing.assert_allclose(out, [0.0, -1.0, 1.0, 0.0], atol=1e-6)


def test_f0_statistics():
    stats = f0_statistics([np.array([0, 100, 200], np.float32),
                           np.array([300.0], np.float32)])
    np.testing.assert_allclose(stats["f0_mean"], 200.0)
    assert stats["f0_std"] > 0
    empty = f0_statistics([np.zeros(5, np.float32)])
    assert empty == {"f0_mean": 0.0, "f0_std": 1.0}
