"""Native speechio library tests: builds the .so, then checks wav decode,
resampling, and threaded batch-crop assembly against the scipy path."""
import numpy as np
import pytest

from speech_inpainting_tpu.data import audio as A
from speech_inpainting_tpu.data import native as N

pytestmark = pytest.mark.skipif(not N.build(),
                                reason="native toolchain unavailable")


@pytest.fixture
def corpus(tmp_path, rng):
    paths = []
    for i in range(4):
        wav = (rng.standard_normal(22050 + 321 * i) * 0.3).astype(np.float32)
        p = tmp_path / f"u{i}.wav"
        A.save_wav(p, wav, 22050)
        paths.append(p)
    return paths


def test_wav_info_and_decode(corpus):
    sr, frames = N.wav_info(corpus[0])
    assert (sr, frames) == A.wav_info(corpus[0])
    got, gsr = N.load_wav(corpus[0])
    want, wsr = A.load_wav(corpus[0])
    assert gsr == wsr
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_native_resample_matches_scipy(corpus):
    ref, _ = A.load_wav(corpus[0])
    want = A.resample(ref, 22050, 16000)
    got = N.resample(ref, 22050, 16000)
    assert abs(len(got) - len(want)) <= 1
    m = min(len(got), len(want))
    # same filter family (kaiser polyphase); allow small numeric differences
    err = np.abs(got[:m] - want[:m]).max()
    assert err < 5e-3, err
    # energy preserved
    assert abs(np.linalg.norm(got) / np.linalg.norm(want) - 1) < 0.01


def test_load_wav_with_resample(corpus):
    got, sr = N.load_wav(corpus[1], target_sr=16000)
    want = A.resample(A.load_wav(corpus[1])[0], 22050, 16000)
    assert sr == 16000 and abs(len(got) - len(want)) <= 1


def test_batch_crops(corpus, rng):
    starts = [0, 100, 5000, 22050 - 10]       # last overruns -> zero pad
    crop = 2048
    batch = N.batch_crops(corpus, starts, crop, target_sr=0,
                          normalize_level=0.95)
    assert batch.shape == (4, crop)
    for i, (p, s) in enumerate(zip(corpus, starts)):
        wav, _ = A.load_wav(p)
        wav = A.peak_normalize(wav, 0.95)
        want = np.zeros(crop, np.float32)
        seg = wav[s:s + crop]
        want[:len(seg)] = seg
        np.testing.assert_allclose(batch[i], want, atol=1e-5)


def test_batch_crops_with_resample(corpus):
    batch = N.batch_crops(corpus[:2], [0, 0], 1600, target_sr=16000,
                          normalize_level=0.0)
    want = A.resample(A.load_wav(corpus[0])[0], 22050, 16000)[:1600]
    assert np.abs(batch[0] - want).max() < 5e-3
