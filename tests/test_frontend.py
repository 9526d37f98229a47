"""Golden tests: STFT/mel frontend vs torch.stft + reference formulas.

The reference computes mels with torch.stft(center=False) after manual reflect
padding (I_ea/hifi_gan/meldataset.py:49-79, I_ea/dataset/mel_dump.py:40-98).
torch (CPU) is available in the test environment, so we check our GEMM-native
frontend against the exact same torch pipeline.
"""
import numpy as np
import pytest
import torch

import jax.numpy as jnp

from speech_inpainting_tpu.ops import (
    HUBERT_ALIGNED_MEL_22K, VOCODER_MEL_22K, VOCODER_MEL_22K_FULLBAND,
    VOCODER_MEL_16K, MelConfig, mel_filterbank, mel_spectrogram,
    stft_magnitude, extend_mel, interp_linear, mask_wave_frames, mask_span,
)


def torch_stft_mag(y, n_fft, hop, win, pad):
    yt = torch.from_numpy(y).float()
    yt = torch.nn.functional.pad(yt.unsqueeze(1), (pad, pad), mode="reflect").squeeze(1)
    window = torch.hann_window(win)
    spec = torch.stft(yt, n_fft, hop_length=hop, win_length=win, window=window,
                      center=False, normalized=False, onesided=True,
                      return_complex=True)
    return torch.sqrt(spec.real ** 2 + spec.imag ** 2 + 1e-9).numpy()


def torch_mel(y, cfg: MelConfig):
    mag = torch_stft_mag(y, cfg.n_fft, cfg.hop_size, cfg.win_size, cfg.padding)
    basis = mel_filterbank(cfg.sampling_rate, cfg.n_fft, cfg.num_mels,
                           cfg.fmin, cfg.fmax)
    mel = np.einsum("mf,bft->bmt", basis, mag)
    return np.log(np.clip(mel, 1e-5, None))


@pytest.mark.parametrize("cfg", [VOCODER_MEL_22K, HUBERT_ALIGNED_MEL_22K,
                                 VOCODER_MEL_22K_FULLBAND, VOCODER_MEL_16K],
                         ids=["hop256_22k", "hop441_22k", "fullband", "hop256_16k"])
def test_mel_matches_torch(rng, cfg):
    y = (rng.standard_normal((2, 8192)) * 0.3).astype(np.float32)
    ours = np.asarray(mel_spectrogram(jnp.asarray(y), cfg))
    ref = torch_mel(y, cfg)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-4)


def test_stft_magnitude_matches_torch(rng):
    y = (rng.standard_normal((1, 4410)) * 0.5).astype(np.float32)
    ours = np.asarray(stft_magnitude(jnp.asarray(y), n_fft=1024, hop=441,
                                     win_size=1024, pad=312))
    ref = torch_stft_mag(y, 1024, 441, 1024, 312)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-4)


def test_mel_filterbank_properties():
    basis = mel_filterbank(22050, 1024, 80, 0.0, 8000.0)
    assert basis.shape == (80, 513)
    # Slaney normalization: each filter integrates to ~2/(width in Hz); all
    # filters are nonneg, nonzero, and band-limited below fmax's bin.
    assert (basis >= 0).all()
    assert (basis.sum(axis=1) > 0).all()
    fmax_bin = int(np.ceil(8000.0 / (22050 / 2) * 512)) + 1
    assert basis[:, fmax_bin + 1:].sum() == 0.0


def test_extend_mel_matches_torch_interpolate(rng):
    mel = rng.standard_normal((1, 80, 100)).astype(np.float32)
    ours = np.asarray(extend_mel(jnp.asarray(mel)))
    ref = torch.nn.functional.interpolate(
        torch.from_numpy(mel).unsqueeze(0), scale_factor=(1, 441 / 256),
        mode="bilinear", align_corners=False).squeeze(0).numpy()
    assert ours.shape == ref.shape
    # torch evaluates source coords as (i+0.5)*(1/s)-0.5 in float32; we divide.
    # Mathematically identical; float32 rounding differs at ~1e-5.
    np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=5e-3)


def test_regrid_size_matches_torch_interpolate(rng):
    mel = rng.standard_normal((1, 80, 57)).astype(np.float32)
    out = np.asarray(interp_linear(jnp.asarray(mel), 98, axis=-1))
    ref = torch.nn.functional.interpolate(
        torch.from_numpy(mel).unsqueeze(0), size=(80, 98),
        mode="bilinear", align_corners=False).squeeze(0).numpy()
    np.testing.assert_allclose(out, ref, atol=1e-4, rtol=5e-3)


def test_mask_wave_frames_convention():
    # reference: inputvalues[pos*320+80 : (pos+len)*320-1] = 0
    wave = np.ones(6400, dtype=np.float32)
    out = np.asarray(mask_wave_frames(jnp.asarray(wave), 3, 5))
    start, end = 3 * 320 + 80, 8 * 320 - 1
    assert (out[start:end] == 0).all()
    assert out[start - 1] == 1 and out[end] == 1


def test_mask_span_dynamic():
    x = np.arange(10, dtype=np.float32)
    out = np.asarray(mask_span(jnp.asarray(x), 2, 3))
    assert (out[2:5] == 0).all() and out[1] == 1 and out[5] == 5
