"""Data-layer tests: multiseries parity with the reference, manifest formats,
audio utilities, EA dataset batching, and the device-prefetch pipeline."""
import json

import numpy as np
import pytest

from speech_inpainting_tpu.data import audio as A
from speech_inpainting_tpu.data import manifests as M
from speech_inpainting_tpu.data.ea_dataset import EADataset, plan_buckets
from speech_inpainting_tpu.data.multiseries import (clip_segment,
                                                    clip_segment_random,
                                                    match_length)
from speech_inpainting_tpu.data.pipeline import device_prefetch

from reference_loader import load_module

REF_MS = load_module("/root/reference/I_da/src/multiseries.py",
                     "ref_multiseries")


def series(rng, frames):
    return rng.standard_normal((frames,)).astype(np.float32)


def test_match_length_parity(rng):
    wav = series(rng, 3001)
    code = series(rng, 9)
    f0 = series(rng, 37)
    mel = series(rng, 11)
    hops = [(wav, 1), (code, 320), (f0, 80), (mel, 256)]
    want = REF_MS.match_length([(s.copy(), h) for s, h in hops])
    got = match_length(hops)
    for a, b in zip(got, want):
        np.testing.assert_array_equal(a, b)


def test_match_length_min_length_repeat(rng):
    wav = series(rng, 1280)
    hops = [(wav, 1), (series(rng, 4), 320)]
    want = REF_MS.match_length([(s.copy(), h) for s, h in hops],
                               min_length=5000)
    got = match_length(hops, min_length=5000)
    for a, b in zip(got, want):
        np.testing.assert_array_equal(a, b)


def test_clip_segment_parity(rng):
    hops = [(series(rng, 2560), 1), (series(rng, 8), 320)]
    want = REF_MS.clip_segment([(s.copy(), h) for s, h in hops], 1280, 640)
    got = clip_segment(hops, 1280, 640)
    for a, b in zip(got, want):
        np.testing.assert_array_equal(a, b)


def test_clip_segment_random_aligned(rng):
    matched = match_length([(series(rng, 6400), 1), (series(rng, 20), 320)])
    out = clip_segment_random([(matched[0], 1), (matched[1], 320)], 1280,
                              np.random.default_rng(0))
    assert out[0].shape[-1] == 1280 and out[1].shape[-1] == 4


def test_manifest_json_and_plain(tmp_path):
    p = tmp_path / "m.txt"
    p.write_text(json.dumps({"audio": "/a/b.wav", "hubert": "1 2 3",
                             "duration": 0.1}) + "\n/plain/c.wav\n")
    files, codes = M.parse_manifest(p)
    assert [str(f) for f in files] == ["/a/b.wav", "/plain/c.wav"]
    np.testing.assert_array_equal(codes[0], [1, 2, 3])


def test_units_roundtrip(tmp_path):
    p = tmp_path / "u.txt"
    M.write_units_file(p, [("x", np.array([5, 5, 7]))])
    (name, units), = M.read_units_file(p)
    assert name == "x"
    np.testing.assert_array_equal(units, [5, 5, 7])


def test_tsv_join_and_split(tmp_path, rng):
    root = tmp_path / "wavs"
    root.mkdir()
    for i in range(4):
        A.save_wav(root / f"s_{i}.wav",
                   rng.standard_normal(1600).astype(np.float32) * 0.1, 16000)
    M.create_tsv_manifest(root, tmp_path, valid_percent=0.0)
    r, rows = M.read_tsv_manifest(tmp_path / "train.tsv")
    assert len(rows) == 4 and all(f == 1600 for _, f in rows)

    units = tmp_path / "units.txt"
    units.write_text("\n".join(f"1 1 2 {i}" for i in range(4)) + "\n")
    entries = M.join_tsv_units(tmp_path / "train.tsv", units, dedup=True)
    assert entries[0]["hubert"].startswith("1 2")  # run-length dedup
    tr, va, te = M.random_split(entries, valid_percent=0.25,
                                test_percent=0.25)
    assert len(tr) == 2 and len(va) == 1 and len(te) == 1


def test_parse_speaker():
    assert M.parse_speaker("/d/p225/p225_001.wav", "parent_name") == "p225"
    assert M.parse_speaker("/d/p225/w/x.wav", "parent_parent_name") == "p225"
    assert M.parse_speaker("/d/p225_001.wav", "_") == "p225"
    assert M.parse_speaker("/d/x.wav", "single") == "A"
    with pytest.raises(NotImplementedError):
        M.parse_speaker("/d/x.wav", "nope")


def test_audio_roundtrip_and_resample(tmp_path, rng):
    wav = (rng.standard_normal(22050) * 0.3).astype(np.float32)
    p = tmp_path / "a.wav"
    A.save_wav(p, wav, 22050)
    back, sr = A.load_wav(p)
    assert sr == 22050
    np.testing.assert_allclose(back, np.clip(wav, -1, 1), atol=1e-4)
    w16, sr16 = A.load_wav(p, target_sr=16000)
    assert sr16 == 16000 and abs(len(w16) - 16000) <= 1
    assert A.wav_info(p) == (22050, 22050)


def test_trim_and_pad(rng):
    sig = np.concatenate([np.zeros(4096, np.float32),
                          rng.standard_normal(8192).astype(np.float32),
                          np.zeros(4096, np.float32)])
    trimmed = A.trim_silence(sig, top_db=20)
    assert len(trimmed) < len(sig)
    assert np.abs(trimmed).max() == np.abs(sig).max()
    assert len(A.pad_to_multiple(trimmed, 1280)) % 1280 == 0


def test_ea_dataset_batches(tmp_path, rng):
    n, max_len = 5, 6400
    paths = []
    for i in range(n):
        p = tmp_path / f"u{i}.wav"
        A.save_wav(p, rng.standard_normal(4800 + 320 * i).astype(np.float32)
                   * 0.2, 16000)
        paths.append(p)
    labels = [rng.integers(0, 10, (max_len - 80) // 320) for _ in range(n)]
    ds = EADataset(paths, labels, max_length=max_len, mask_length=3,
                   cache_dir=str(tmp_path / "cache"))
    batches = list(ds.batches(2, epoch=0))
    assert len(batches) == 2
    b = batches[0]
    assert b["wav"].shape == (2, max_len)
    assert b["labels"].shape == (2, 3)
    assert (b["attn_mask"].sum(1) > 0).all()
    # deterministic per (seed, epoch); different across epochs
    again = list(ds.batches(2, epoch=0))
    np.testing.assert_array_equal(b["mask_pos"], again[0]["mask_pos"])
    other = list(ds.batches(2, epoch=1))
    assert not np.array_equal(b["mask_pos"], other[0]["mask_pos"]) or \
        not np.array_equal(b["wav"], other[0]["wav"])
    # cache reuse: a second instance maps the same files
    ds2 = EADataset(paths, labels, max_length=max_len, mask_length=3,
                    cache_dir=str(tmp_path / "cache"))
    np.testing.assert_array_equal(np.asarray(ds2.waves),
                                  np.asarray(ds.waves))


def test_plan_buckets():
    lengths = [1000, 2000, 3000, 4000, 5000, 6000]
    bl = plan_buckets(lengths, 3)
    assert bl == sorted(bl) and bl[-1] == 6000
    assert all(any(b >= l for b in bl) for l in lengths)
    # clamp to the dataset's truncation length
    assert plan_buckets(lengths, 2, max_length=4500)[-1] == 4500
    # degenerate: one bucket == max length
    assert plan_buckets(lengths, 1) == [6000]


def test_ea_dataset_bucketed_batches(tmp_path, rng):
    n, max_len = 6, 6400
    paths, true_lens = [], []
    for i in range(n):
        t = 4800 + 320 * i
        p = tmp_path / f"u{i}.wav"
        A.save_wav(p, rng.standard_normal(t).astype(np.float32) * 0.2, 16000)
        paths.append(p)
        true_lens.append(t)
    labels = [rng.integers(0, 10, (max_len - 80) // 320) for _ in range(n)]
    ds = EADataset(paths, labels, max_length=max_len, mask_length=3)
    buckets = plan_buckets(ds.lengths, 2)
    batches = list(ds.batches(2, epoch=0, buckets=buckets, drop_last=False))
    # every utterance exactly once; tight padding per bucket
    seen = 0
    widths = set()
    for b in batches:
        w = b["wav"].shape[1]
        widths.add(w)
        assert w in buckets
        lens = b["attn_mask"].sum(1)
        assert (lens <= w).all()
        assert b["labels"].shape[1] == 3
        seen += b["wav"].shape[0]
    assert seen == n
    assert min(widths) < max_len  # small bucket actually pads tighter
    # items land in the smallest covering bucket
    for b in batches:
        w = b["wav"].shape[1]
        for l in b["attn_mask"].sum(1):
            assert l <= w
            smaller = [x for x in buckets if x < w]
            if smaller:
                assert l > smaller[-1]
    # deterministic per (seed, epoch)
    again = list(ds.batches(2, epoch=0, buckets=buckets, drop_last=False))
    for a, b in zip(batches, again):
        np.testing.assert_array_equal(a["wav"], b["wav"])
        np.testing.assert_array_equal(a["mask_pos"], b["mask_pos"])


def test_device_prefetch(rng):
    batches = [{"x": rng.standard_normal((4, 8)).astype(np.float32)}
               for _ in range(5)]
    out = list(device_prefetch(iter(batches)))
    assert len(out) == 5
    for a, b in zip(out, batches):
        np.testing.assert_array_equal(np.asarray(a["x"]), b["x"])


def test_device_prefetch_propagates_errors():
    def gen():
        yield {"x": np.zeros(3, np.float32)}
        raise ValueError("loader broke")
    it = device_prefetch(gen())
    next(it)
    with pytest.raises(ValueError):
        list(it)


def test_ea_bucketed_drop_last_spills_upward(tmp_path, rng):
    """With drop_last, a bucket's sub-batch_size remainder must spill into
    the NEXT bucket instead of being dropped — bucket membership is
    length-determined, so dropping would exclude the same utterances every
    epoch. Only the final bucket's remainder is dropped (the unbucketed
    drop_last contract). Bucket lengths beyond max_length are clamped."""
    n, max_len = 7, 6400
    paths = []
    for i in range(n):
        t = 4800 + 320 * i
        p = tmp_path / f"u{i}.wav"
        A.save_wav(p, rng.standard_normal(t).astype(np.float32) * 0.2, 16000)
        paths.append(p)
    labels = [rng.integers(0, 10, (max_len - 80) // 320) for _ in range(n)]
    ds = EADataset(paths, labels, max_length=max_len, mask_length=3)
    # bucket boundary at 5500: 3 wavs below (4800..5440), 4 above; a huge
    # second bucket exercises the clamp
    batches = list(ds.batches(2, epoch=0, buckets=[5500, 999999],
                              drop_last=True))
    seen = sum(b["wav"].shape[0] for b in batches)
    assert seen == (n // 2) * 2           # only the FINAL remainder dropped
    assert all(b["wav"].shape[1] <= max_len for b in batches)  # clamped
    # the small bucket contributed a full batch AND its odd item trained
    widths = sorted({b["wav"].shape[1] for b in batches})
    assert widths[0] == 5500 and widths[-1] == max_len
    small_items = sum(b["wav"].shape[0] for b in batches
                      if b["wav"].shape[1] == 5500)
    assert small_items == 2               # 3rd short item spilled upward
