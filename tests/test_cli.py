"""CLI smoke tests on tiny synthetic data: kmeans dump/fit/label pipeline,
prep tools (preprocess/manifest/parse-codes/f0-stats), and the mask-sweep
evaluation fixture."""
import json
from pathlib import Path

import numpy as np

from speech_inpainting_tpu.cli import kmeans_cli, prep
from speech_inpainting_tpu.data import audio as A
from speech_inpainting_tpu.infer.evaluate import (build_mask_sweep,
                                                  load_mask_sweep,
                                                  save_mask_sweep)


def make_corpus(tmp_path, rng, n=3, sr=22050, seconds=0.6):
    wavs = tmp_path / "wavs"
    wavs.mkdir()
    for i in range(n):
        t = np.arange(int(sr * seconds)) / sr
        w = 0.3 * np.sin(2 * np.pi * (150 + 40 * i) * t)
        A.save_wav(wavs / f"p{i}_u.wav", w.astype(np.float32), sr)
    return wavs


def test_kmeans_cli_pipeline(tmp_path, rng):
    wavs = make_corpus(tmp_path, rng)
    feat_dir = tmp_path / "feats"
    kmeans_cli.main(["dump", "--wavs", str(wavs), "--out", str(feat_dir)])
    flat = np.load(feat_dir / "train_valid.npy")
    assert flat.ndim == 2 and flat.shape[1] == 80

    model = tmp_path / "model.npy"
    kmeans_cli.main(["fit", "--features", str(feat_dir / "train_valid.npy"),
                     "--k", "5", "--iters", "5", "--n-init", "1",
                     "--out", str(model)])
    C = np.load(model)
    assert C.shape == (5, 80)

    lab_dir = tmp_path / "labels"
    kmeans_cli.main(["label", "--wavs", str(wavs), "--model", str(model),
                     "--out", str(lab_dir)])
    labels = np.load(lab_dir / "p0_u_labels.npy")
    mel = np.load(feat_dir / "p0_u_mel.npy")
    assert labels.shape == (mel.shape[1],)
    assert labels.max() < 5


def test_prep_preprocess_and_manifest(tmp_path, rng):
    wavs = make_corpus(tmp_path, rng, sr=22050)
    out = tmp_path / "prep16k"
    prep.main(["preprocess", "--root", str(wavs), "--out", str(out),
               "--sr", "16000"])
    files = sorted(out.glob("*.wav"))
    assert len(files) == 3
    for f in files:
        sr, n = A.wav_info(f)
        assert sr == 16000 and n % 1280 == 0

    dest = tmp_path / "manifests"
    prep.main(["manifest", "--root", str(out), "--dest", str(dest)])
    assert (dest / "train.tsv").exists()

    units = tmp_path / "units.txt"
    lines = [f"p{i}_u|1 1 2 3" for i in range(3)]
    units.write_text("\n".join(lines) + "\n")
    prep.main(["parse-codes", "--manifest", str(dest / "train.tsv"),
               "--units", str(units), "--outdir", str(tmp_path / "jl"),
               "--dedup", "--valid-percent", "0.34",
               "--test-percent", "0.0"])
    train = (tmp_path / "jl" / "train.txt").read_text().strip().splitlines()
    entry = json.loads(train[0])
    assert entry["hubert"] == "1 2 3"                 # dedup applied

    # f0-stats consumes JSON-lines/path manifests (not tsv)
    stats_out2 = tmp_path / "f0_stats2.json"
    prep.main(["f0-stats", "--manifest", str(tmp_path / "jl" / "train.txt"),
               "--out", str(stats_out2)])
    stats = json.loads(stats_out2.read_text())
    assert len(stats["speakers"]) >= 1
    assert all("f0_mean" in v for v in stats["stats"].values())


def test_mask_sweep_fixture(tmp_path, rng):
    sweep = build_mask_sweep({"a": 32000, "b": 48000},
                             mask_lengths_ms=(100, 200), n_positions=5)
    assert set(sweep["a"]) == {100, 200}
    assert len(sweep["a"][100]) == 5
    assert all(0 <= p <= 32000 - 100 * 16 for p in sweep["a"][100])
    p = tmp_path / "sweep.json"
    save_mask_sweep(sweep, p)
    again = load_mask_sweep(p)
    assert again["b"][200] == sweep["b"][200]


def test_prep_splits_regimes(tmp_path, rng):
    root = tmp_path / "vctk"
    root.mkdir()
    for spk in ("p225", "p226", "p227", "p315"):
        for txt in ("001", "002", "003", "004"):
            A.save_wav(root / f"{spk}_{txt}.wav",
                       rng.standard_normal(800).astype(np.float32) * 0.1,
                       16000)
    dest = tmp_path / "splits"
    prep.main(["splits", "--root", str(root), "--dest", str(dest),
               "--regime", "speakers", "--ratio", "0.67"])
    train = dest.joinpath("training.txt").read_text().split()
    valid = dest.joinpath("validation.txt").read_text().split()
    tr_spk = {n.split("_")[0] for n in train}
    va_spk = {n.split("_")[0] for n in valid}
    assert not (tr_spk & va_spk)                 # unseen speakers
    assert "p315" not in tr_spk | va_spk         # excluded
    assert len(train) + len(valid) == 12

    prep.main(["splits", "--root", str(root), "--dest", str(dest),
               "--regime", "both", "--ratio", "0.5"])
    train = dest.joinpath("training.txt").read_text().split()
    valid = dest.joinpath("validation.txt").read_text().split()
    tr = {(n.split("_")[0], n.split("_", 1)[1]) for n in train}
    va = {(n.split("_")[0], n.split("_", 1)[1]) for n in valid}
    assert not ({s for s, _ in tr} & {s for s, _ in va})
    assert not ({t for _, t in tr} & {t for _, t in va})


def test_prep_summary_reports_overlap(tmp_path, capsys):
    """`prep summary` = preprocessing.py:62-118: counts, validation
    percentages, and the train∩valid speaker/text overlap lines that
    sanity-check the regimes ('both' must report 0 common of each)."""
    dest = tmp_path
    (dest / "training.txt").write_text("p225_001\np225_002\np226_001\n")
    (dest / "validation.txt").write_text("p227_003\n")
    prep.main(["summary", "--dest", str(dest)])
    out = capsys.readouterr().out
    assert "# of utterances in training set: 3" in out
    assert "# of utterances in validation set: 1" in out
    assert "33.33% utterances as validation" in out
    assert "# of unique speakers in training set: 2" in out
    assert "# of common unique speakers between training&validation: 0" in out
    assert "# of common unique texts between training&validation: 0" in out

    # overlapping split (the 'texts' regime shares speakers): overlap != 0
    (dest / "validation.txt").write_text("p225_003|some text\n")
    prep.main(["summary", "--dest", str(dest)])
    out = capsys.readouterr().out
    assert "# of common unique speakers between training&validation: 1" in out


def test_predict_ea_mask_span_parsing():
    import pytest
    from speech_inpainting_tpu.cli.predict_ea import parse_mask_spans

    # single --start-sec/--end-sec span (predict.py:85-90 grid convention)
    pos, ln = parse_mask_spans(1.0, 1.2, None)
    assert list(pos) == [int(1.0 * 16000) // 320] and list(ln) == [10]
    # repeatable --mask spans for long-form mode
    pos, ln = parse_mask_spans(None, None, ["0.5-0.7", "3.0-3.4"])
    assert list(pos) == [25, 150] and list(ln) == [10, 20]
    # sub-frame span still masks at least one frame
    _, ln = parse_mask_spans(None, None, ["0.50-0.51"])
    assert list(ln) == [1]
    with pytest.raises(ValueError):
        parse_mask_spans(None, None, None)       # no span at all
    with pytest.raises(ValueError):
        parse_mask_spans(2.0, 1.0, None)         # end before start


def test_kaldi_ark_roundtrip(tmp_path, rng):
    """Self-contained kaldi binary matrix I/O (utils/kaldi.py — replaces
    kaldi_io + copy-feats, reference I_da/src/utils.py:346-356): ark scan
    and scp random access both recover the written matrices bit-exactly,
    f32 and f64 tokens included."""
    import pytest
    from speech_inpainting_tpu.utils import kaldi

    mats = {
        "utt_a": rng.standard_normal((7, 13)).astype(np.float32),
        "utt_b": rng.standard_normal((1, 4)).astype(np.float64),
        "utt_c": np.zeros((3, 2), np.float32),
    }
    ark, scp = kaldi.write_mats(mats.items(), tmp_path / "feats")
    got_ark = kaldi.read_ark(ark)
    got_scp = kaldi.read_scp(scp)
    assert list(got_ark) == list(mats)
    for k in mats:
        np.testing.assert_array_equal(got_ark[k], mats[k])
        np.testing.assert_array_equal(got_scp[k], mats[k])
        assert got_ark[k].dtype == mats[k].dtype
    with pytest.raises(ValueError):
        kaldi.write_mats([("bad key", np.zeros((2, 2)))], tmp_path / "x")
    with pytest.raises(ValueError):
        kaldi.write_mats([("v", np.zeros(5))], tmp_path / "y")   # 1-D


def test_prep_features_dump(tmp_path, rng):
    """`prep features` mirrors get_and_dump_features (I_da/src/utils.py:
    114-144): flattened .npy + manifest copy, optional kaldi ark/scp export,
    and --sample-pct subsampling."""
    import torch
    from transformers import HubertConfig as HFConfig
    from transformers import HubertModel as HFHubert

    torch.manual_seed(0)
    hf = HFHubert(HFConfig(
        conv_dim=[8, 8, 8], conv_stride=[5, 2, 2], conv_kernel=[10, 3, 3],
        conv_bias=False, feat_extract_norm="group", hidden_size=16,
        num_hidden_layers=2, num_attention_heads=2, intermediate_size=24,
        num_conv_pos_embeddings=15, num_conv_pos_embedding_groups=1,
        do_stable_layer_norm=False))
    ckpt = tmp_path / "tiny_hubert"
    hf.save_pretrained(ckpt)

    wavs = make_corpus(tmp_path, rng, sr=16000, seconds=0.4)
    dest = tmp_path / "manifests"
    prep.main(["manifest", "--root", str(wavs), "--dest", str(dest)])

    out = tmp_path / "feat" / "train_feats.npy"
    prep.main(["features", "--manifest", str(dest / "train.tsv"),
               "--hubert", str(ckpt), "--layer", "1",
               "--out", str(out), "--kaldi", str(tmp_path / "feat" / "k")])
    flat = np.load(out)
    assert flat.ndim == 2 and flat.shape[1] == 16
    assert (out.parent / "train.tsv").exists()        # manifest copied

    from speech_inpainting_tpu.utils import kaldi
    per_utt = kaldi.read_scp(tmp_path / "feat" / "k.scp")
    assert len(per_utt) == 3
    np.testing.assert_allclose(
        np.concatenate([per_utt[k] for k in per_utt]), flat, atol=1e-6)

    sub = tmp_path / "feat" / "sub.npy"
    prep.main(["features", "--manifest", str(dest / "train.tsv"),
               "--hubert", str(ckpt), "--layer", "1",
               "--sample-pct", "0.34", "--out", str(sub)])
    assert len(np.load(sub)) < len(flat)              # subsampled


def test_vocode_quantize_mel_demo(tmp_path, rng, monkeypatch):
    """--quantize-mel on vocode wav2wav = replace_mel_cluster
    (I_ea/hifi_gan/inference_modified.py:75-89): the requested span becomes
    exact centroids, frames outside are untouched; the CLI writes the
    _generated_quantized artifact (generator stubbed — the demo's subject
    is the mel substitution, not the vocoder)."""
    from speech_inpainting_tpu.cli import vocode
    from speech_inpainting_tpu.quantize.kmeans import KMeans

    C = rng.standard_normal((5, 80)).astype(np.float32)
    km = KMeans(centroids=C)
    mel = rng.standard_normal((1, 80, 40)).astype(np.float32)
    q = vocode.replace_mel_span_with_centroids(mel, km, 10, 8)
    np.testing.assert_array_equal(q[0, :, :10], mel[0, :, :10])
    np.testing.assert_array_equal(q[0, :, 18:], mel[0, :, 18:])
    for t in range(10, 18):
        assert any(np.allclose(q[0, :, t], c) for c in C)
        lab = int(np.asarray(km(mel[0, :, t][None]))[0])
        np.testing.assert_allclose(q[0, :, t], C[lab], atol=1e-6)

    model = tmp_path / "km.npy"
    np.save(model, C)
    wavs = make_corpus(tmp_path, rng, n=1, sr=22050, seconds=0.6)
    monkeypatch.setattr(
        vocode, "_load_generator",
        lambda ckpt, cfg: (lambda mel: np.zeros((1, 256)),
                           __import__("types").SimpleNamespace(
                               sampling_rate=22050)))
    out = tmp_path / "gen"
    vocode.main(["wav2wav", "--input-dir", str(wavs),
                 "--checkpoint", "unused", "--out", str(out),
                 "--quantize-mel", str(model), "--quantize-span", "5:10"])
    assert (out / "p0_u_generated_quantized.wav").exists()


def test_predict_ea_half_specified_span_errors():
    import pytest
    from speech_inpainting_tpu.cli.predict_ea import parse_mask_spans
    with pytest.raises(ValueError, match="together"):
        parse_mask_spans(1.0, None, ["2.0-2.2"])   # forgot --end-sec
    with pytest.raises(ValueError, match="together"):
        parse_mask_spans(None, 2.0, None)
