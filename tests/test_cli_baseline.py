"""sit-predict-asr CLI: the ASR→TTS baseline script surface
(reference entry: I_ea/predict_asr.py:23-59 constants block)."""
import numpy as np
import pytest

from speech_inpainting_tpu.cli import predict_asr
from speech_inpainting_tpu.data import audio as A

SR = 16000


def _tone(f, seconds, amp=0.3):
    t = np.arange(int(SR * seconds)) / SR
    return (amp * np.sin(2 * np.pi * f * t)).astype(np.float32)


def test_predict_asr_cli_synth_path(tmp_path):
    """Pre-rendered TTS leg (step_tts=0): the pure-DSP chain writes the
    reference's artifact set and the patch actually lands in the mask."""
    y = _tone(150, 2.0)
    span = (0.8, 1.1)
    masked = y.copy()
    masked[int(span[0] * SR):int(span[1] * SR)] = 0.0
    A.save_wav(tmp_path / "masked.wav", masked, SR)
    # "synthetic rendering": same sentence, other voice = other f0
    A.save_wav(tmp_path / "tts.wav", _tone(190, 2.0), SR)

    out = tmp_path / "base"
    predict_asr.main([
        "--input", str(tmp_path / "masked.wav"), "--mask", "0.8:1.1",
        "--synth", str(tmp_path / "tts.wav"), "--out", str(out),
        "--transcript", "a test sentence", "--no-crop-silence"])
    names = {p.name for p in out.iterdir()}
    assert {"orig.wav", "output_tts.wav", "mask_synth_stretched.wav",
            "inpainted.wav", "inpainted_with_silence.wav",
            "transcript.txt"} <= names, names

    inp, sr = A.load_wav(out / "inpainted_with_silence.wav")
    assert sr == SR and len(inp) == len(masked)
    mid = inp[int(span[0] * SR) + 400:int(span[1] * SR) - 400]
    assert float(np.abs(mid).mean()) > 0.05   # mask no longer silent
    # outside the crossfaded span the original is untouched
    np.testing.assert_allclose(inp[:int(span[0] * SR) - 400],
                               masked[:int(span[0] * SR) - 400], atol=1e-4)


def test_predict_asr_cli_donor_path(tmp_path, rng):
    """In-house UnitResynthTTS leg: donor recording → HuBERT units →
    CodeGenerator rendering → DSP splice, from the real artifact formats
    (torch g_*, HF dir, .npy centroids)."""
    from test_cli_trainers import make_ida_cli_stack

    stack = make_ida_cli_stack(tmp_path, rng)
    y = _tone(150, 2.2)
    masked = y.copy()
    masked[int(0.9 * SR):int(1.2 * SR)] = 0.0
    A.save_wav(tmp_path / "masked.wav", masked, SR)

    out = tmp_path / "base"
    predict_asr.main([
        "--input", str(tmp_path / "masked.wav"), "--mask", "0.9:1.2",
        "--donor", str(stack["wav"]), "--config", str(stack["config"]),
        "--codegen-checkpoint", str(stack["checkpoint"]),
        "--hubert", str(stack["hubert"]), "--layer", "2",
        "--kmeans", str(stack["kmeans"]), "--out", str(out),
        "--speaker-wav", str(stack["wav"])])
    names = {p.name for p in out.iterdir()}
    assert {"orig.wav", "speaker_wav.wav", "output_tts.wav",
            "inpainted.wav", "transcript.txt"} <= names, names
    tts, _ = A.load_wav(out / "output_tts.wav")
    assert float(np.abs(tts).max()) > 1e-3    # rendered, not silence


def test_predict_asr_cli_arg_validation(tmp_path):
    A.save_wav(tmp_path / "m.wav", _tone(150, 1.0), SR)
    with pytest.raises(SystemExit):   # synth XOR donor
        predict_asr.main(["--input", str(tmp_path / "m.wav"),
                          "--mask", "0.2:0.4", "--out", str(tmp_path)])
    with pytest.raises(SystemExit):   # donor without the stack flags
        predict_asr.main(["--input", str(tmp_path / "m.wav"),
                          "--mask", "0.2:0.4", "--donor",
                          str(tmp_path / "m.wav"), "--out", str(tmp_path)])
    with pytest.raises(SystemExit):   # malformed span
        predict_asr.main(["--input", str(tmp_path / "m.wav"),
                          "--mask", "0.4", "--synth",
                          str(tmp_path / "m.wav"), "--out", str(tmp_path)])
