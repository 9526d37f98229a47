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


# ---------------------------------------------------------------- FLAC
# The native from-scratch FLAC decoder (speechio.cc) against streams built
# by the minimal test-fixture encoder (tests/flac_fixture.py).
from flac_fixture import encode as flac_encode  # noqa: E402


def _write(tmp_path, blob, name="t.flac"):
    p = tmp_path / name
    p.write_bytes(blob)
    return p


def _i16(rng, n, smooth=False):
    if smooth:
        t = np.arange(n)
        x = (8000 * np.sin(2 * np.pi * t / 97)
             + 3000 * np.sin(2 * np.pi * t / 13)).astype(np.int64)
        return x
    return rng.integers(-32768, 32768, n).astype(np.int64)


def test_flac_verbatim_and_constant(tmp_path, rng):
    x = _i16(rng, 1000)
    p = _write(tmp_path, flac_encode([x], sr=48000, modes=["verbatim"]))
    sr, frames = N.flac_info(p)
    assert (sr, frames) == (48000, 1000)
    got, gsr = N.load_wav(p)
    assert gsr == 48000
    np.testing.assert_allclose(got, x / 32768.0, atol=1e-7)

    c = np.full(512, -1234, np.int64)
    p = _write(tmp_path, flac_encode([c], modes=["constant"]), "c.flac")
    got, _ = N.load_wav(p)
    np.testing.assert_allclose(got, c / 32768.0, atol=1e-7)


def test_flac_fixed_and_lpc_predictors(tmp_path, rng):
    x = _i16(rng, 2000, smooth=True)
    for mode in ("fixed0", "fixed1", "fixed2", "fixed3", "fixed4", "lpc1"):
        p = _write(tmp_path, flac_encode([x], modes=[mode]),
                   f"{mode}.flac")
        got, _ = N.load_wav(p)
        np.testing.assert_allclose(got, x / 32768.0, atol=1e-7,
                                   err_msg=mode)


def test_flac_rice_escape_and_wasted_bits(tmp_path, rng):
    x = _i16(rng, 700)
    p = _write(tmp_path, flac_encode([x], modes=["fixed0_escape"]))
    got, _ = N.load_wav(p)
    np.testing.assert_allclose(got, x / 32768.0, atol=1e-7)

    c = np.full(300, 2468, np.int64)          # even: survives 1 wasted bit
    p = _write(tmp_path, flac_encode([c], modes=["wasted_constant"]),
               "w.flac")
    got, _ = N.load_wav(p)
    np.testing.assert_allclose(got, c / 32768.0, atol=1e-7)


def test_flac_multiframe_and_stereo(tmp_path, rng):
    x = _i16(rng, 3000, smooth=True)
    p = _write(tmp_path, flac_encode([x], modes=["fixed2"],
                                     frame_size=1024))
    got, _ = N.load_wav(p)
    np.testing.assert_allclose(got, x / 32768.0, atol=1e-7)

    left = _i16(rng, 800, smooth=True)
    right = (left * 0.7).astype(np.int64)
    # independent stereo decodes to the downmix (decode_wav policy)
    p = _write(tmp_path, flac_encode([left, right]), "st.flac")
    got, _ = N.load_wav(p)
    np.testing.assert_allclose(got, (left + right) / 2 / 32768.0, atol=1e-7)
    # left/side assignment: stream carries [left, left - right]
    p = _write(tmp_path, flac_encode([left, left - right], ch_code=8),
               "ls.flac")
    got, _ = N.load_wav(p)
    np.testing.assert_allclose(got, (left + right) / 2 / 32768.0, atol=1e-7)


def test_flac_through_audio_api_with_resample(tmp_path, rng):
    x = _i16(rng, 4800, smooth=True)
    p = _write(tmp_path, flac_encode([x], sr=48000, modes=["fixed2"]))
    got, sr = A.load_flac(p, target_sr=16000)
    assert sr == 16000
    want = A.resample((x / 32768.0).astype(np.float32), 48000, 16000)
    assert abs(len(got) - len(want)) <= 1
    m = min(len(got), len(want))
    assert np.abs(got[:m] - want[:m]).max() < 5e-3
