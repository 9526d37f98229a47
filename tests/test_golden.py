"""Golden tests against the reference's committed artifacts
(I_ea/prediction/LJ050-0271): our masking must reproduce the exact
masked waveform the reference shipped, and the mel frontend must be
consistent on that real audio."""
from pathlib import Path

import numpy as np
import pytest
from scipy.io import wavfile

import jax.numpy as jnp

from speech_inpainting_tpu.ops.masking import mask_wave_frames
from speech_inpainting_tpu.ops.mel import (HUBERT_ALIGNED_MEL_22K,
                                           mel_spectrogram)

GOLDEN = Path("/root/reference/I_ea/prediction/LJ050-0271")

pytestmark = pytest.mark.skipif(not GOLDEN.exists(),
                                reason="reference artifacts unavailable")


def test_masking_matches_committed_artifact():
    """predict.py zeroed [pos·320+80, (pos+len)·320−1) before committing
    masked.wav — our mask_wave_frames must reproduce it bit-exactly."""
    _, orig = wavfile.read(GOLDEN / "orig.wav")
    _, masked = wavfile.read(GOLDEN / "masked.wav")
    o = orig.astype(np.float32)

    nz = np.nonzero(masked == 0)[0]
    runs = np.split(nz, np.where(np.diff(nz) != 1)[0] + 1)
    span = max(runs, key=len)
    pos = (int(span[0]) - 80) // 320
    assert int(span[0]) == pos * 320 + 80          # start convention
    length = (int(span[-1]) + 2 + 80) // 320 - pos
    assert (pos + length) * 320 - 1 == int(span[-1]) + 1  # end convention
    assert length == 20                            # the committed 400 ms mask

    ours = np.asarray(mask_wave_frames(jnp.asarray(o), pos, length))
    np.testing.assert_array_equal(ours, masked.astype(np.float32))


def test_mel_frontend_on_golden_audio():
    """Frame count and finiteness of the hop-441 mel on the real artifact
    (the grid the inpainting splice indexes into)."""
    sr, orig = wavfile.read(GOLDEN / "orig.wav")
    assert sr == 16000
    wav22, _ = __import__("speech_inpainting_tpu.data.audio",
                          fromlist=["load_wav"]).load_wav(
        GOLDEN / "orig.wav", target_sr=22050)
    mel = np.asarray(mel_spectrogram(jnp.asarray(wav22),
                                     HUBERT_ALIGNED_MEL_22K))
    assert mel.shape[0] == 80
    assert mel.shape[1] == HUBERT_ALIGNED_MEL_22K.num_frames(len(wav22))
    assert np.isfinite(mel).all()
    # 20 ms grids line up: mel frames ≈ HuBERT frames of the 16 kHz stream
    hubert_frames = (len(orig) - 400) // 320 + 1
    assert abs(mel.shape[1] - hubert_frames) <= 3
