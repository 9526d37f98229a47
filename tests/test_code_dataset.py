"""CodeDataset / F0Dataset tests: alignment, caching, batch shapes, and an
end-to-end feed into the I_da GAN step shapes."""
import numpy as np

from speech_inpainting_tpu.data import audio as A
from speech_inpainting_tpu.data.code_dataset import (CodeDataset,
                                                     CodeDatasetConfig,
                                                     F0DatasetTPU,
                                                     mel_stats_embedder)
from speech_inpainting_tpu.ops.mel import MelConfig


def make_wavs(tmp_path, rng, n=3, seconds=1.0):
    paths, codes = [], []
    for i in range(n):
        t = np.arange(int(16000 * seconds)) / 16000.0
        wav = (0.3 * np.sin(2 * np.pi * (120 + 30 * i) * t)).astype(np.float32)
        p = tmp_path / f"spk{i}_utt.wav"
        A.save_wav(p, wav, 16000)
        paths.append(p)
        codes.append(rng.integers(0, 100, len(wav) // 320).astype(np.int64))
    return paths, codes


def test_code_dataset_alignment_and_batches(tmp_path, rng):
    paths, codes = make_wavs(tmp_path, rng)
    cfg = CodeDatasetConfig(segment_size=8960, embedding_dim=64)
    ds = CodeDataset(paths, codes, cfg, cache_dir=str(tmp_path / "c"))
    it = ds[0]
    # LCM alignment: audio = code*320 = f0*80 = mel*256 in samples
    assert it["audio"].shape[-1] == it["code"].shape[-1] * 320
    assert it["audio"].shape[-1] == it["f0"].shape[-1] * 80
    assert it["audio"].shape[-1] == it["mel"].shape[-1] * 256
    assert it["emb"].shape == (64,)

    b = next(ds.batches(2, epoch=0))
    assert b["audio"].shape == (2, 1, 8960)
    assert b["code"].shape == (2, 8960 // 320)
    assert b["f0"].shape == (2, 1, 8960 // 80)
    assert b["mel_loss"].shape[0] == 2 and b["mel_loss"].shape[-1] == 8960 // 256
    assert b["spkr"].shape == (2, 1)
    assert b["code"].dtype == np.int32

    # cache hit produces identical items
    ds2 = CodeDataset(paths, codes, cfg, cache_dir=str(tmp_path / "c"))
    np.testing.assert_array_equal(ds2[0]["audio"], it["audio"])


def test_code_dataset_speaker_ids(tmp_path, rng):
    paths, codes = make_wavs(tmp_path, rng)
    ds = CodeDataset(paths, codes, CodeDatasetConfig(embedding_dim=32))
    assert len(ds.id_to_spkr) == 3
    assert {int(ds[i]["spkr"][0]) for i in range(3)} == {0, 1, 2}


def test_f0_dataset(tmp_path, rng):
    paths, _ = make_wavs(tmp_path, rng, n=2, seconds=1.5)
    ds = F0DatasetTPU(paths, segment_size=16640,
                      cache_dir=str(tmp_path / "f0c"))
    b = next(ds.batches(2, epoch=0))
    assert b["f0"].shape == (2, 1, 16640 // 80)
    # normalized voiced frames: zero-mean-ish, unvoiced exactly zero
    voiced = b["f0"][b["f0"] != 0]
    assert voiced.size > 0 and abs(voiced.mean()) < 1.0


def test_mel_stats_embedder_deterministic(rng):
    emb = mel_stats_embedder(48)
    wav = rng.standard_normal(16000).astype(np.float32) * 0.1
    a, b = emb(wav, 16000), emb(wav, 16000)
    np.testing.assert_array_equal(a, b)
    assert a.shape == (48,) and abs(np.linalg.norm(a) - 1.0) < 1e-5
