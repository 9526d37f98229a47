"""sit-score CLI: the user-facing metric driver over wav pairs
(reference metric surface: I_ea/metrics.py:13-141)."""
import json

import numpy as np
import pytest

from speech_inpainting_tpu.cli import score as S
from speech_inpainting_tpu.data import audio as A

SR = 16000


def _speechy(rng, seconds=1.2, sr=SR):
    """Modulated multi-tone — enough voiced structure for PESQ/STOI to be
    in their sensible ranges (pure noise pins both to the floor)."""
    t = np.arange(int(sr * seconds)) / sr
    f0 = 120 + 30 * np.sin(2 * np.pi * 2.1 * t)
    w = sum(0.25 / k * np.sin(2 * np.pi * k * np.cumsum(f0) / sr)
            for k in range(1, 6))
    env = 0.5 + 0.5 * np.square(np.sin(2 * np.pi * 1.7 * t))
    return (w * env).astype(np.float32)


def test_score_pair_clean_vs_noisy(rng):
    ref = _speechy(rng)
    noisy = ref + 0.05 * rng.standard_normal(ref.size).astype(np.float32)
    clean = S.score_pair(ref, ref.copy(), SR)
    deg = S.score_pair(ref, noisy, SR)
    # identical pair sits at each metric's ceiling; noise strictly degrades
    assert clean["pesq"] > deg["pesq"] > 1.0
    assert clean["stoi"] > 0.99 and clean["estoi"] > 0.99
    assert deg["stoi"] < clean["stoi"]
    assert clean["si_sdr"] > 50 > deg["si_sdr"] > 0
    assert clean["lsd_d2"] < 1e-3 < deg["lsd_d2"]
    assert clean["lsd_rmse"] < 1e-3 < deg["lsd_rmse"]


def test_score_cli_pair_and_dirs(tmp_path, rng):
    ref = _speechy(rng)
    noisy = ref + 0.1 * rng.standard_normal(ref.size).astype(np.float32)
    gt, out = tmp_path / "gt", tmp_path / "out"
    gt.mkdir(), out.mkdir()
    for name, w in (("a", ref), ("b", noisy)):
        A.save_wav(gt / f"{name}.wav", ref, SR)
        A.save_wav(out / f"{name}.wav", w, SR)
    res = S.main(["--ref", str(gt / "a.wav"), "--deg", str(out / "b.wav")])
    assert set(res["files"]) == {"b"} and res["files"]["b"]["pesq"] < 4.0

    jpath = tmp_path / "scores.json"
    res = S.main(["--ref-dir", str(gt), "--deg-dir", str(out),
                  "--json", str(jpath)])
    files = res["files"]
    # aggregate is namespaced: a degraded file named mean.wav can't collide
    assert set(res) == {"files", "mean"} and set(files) == {"a", "b"}
    assert files["a"]["si_sdr"] > files["b"]["si_sdr"]
    assert res["mean"]["pesq"] == pytest.approx(
        (files["a"]["pesq"] + files["b"]["pesq"]) / 2)
    assert json.loads(jpath.read_text())["mean"]["stoi"] == pytest.approx(
        res["mean"]["stoi"])


def test_score_cli_uer_and_arg_errors(tmp_path, rng):
    ref = _speechy(rng)
    corrupted = ref.copy()   # noise over a third of it ⇒ those units change
    span = slice(ref.size // 3, 2 * ref.size // 3)
    corrupted[span] = 0.3 * rng.standard_normal(
        ref.size // 3 + 1).astype(np.float32)[:corrupted[span].size]
    A.save_wav(tmp_path / "r.wav", ref, SR)
    A.save_wav(tmp_path / "d.wav", corrupted, SR)
    km = tmp_path / "km.npy"
    np.save(km, rng.standard_normal((8, 80)).astype(np.float32))
    res = S.main(["--ref", str(tmp_path / "r.wav"),
                  "--deg", str(tmp_path / "d.wav"), "--kmeans", str(km)])
    assert 0.0 < res["files"]["d"]["uer"] <= 2.0  # real edit cost

    # masked-span UER: corrupted span scores, clean span scores 0
    t0, t1 = ref.size // 3 / SR, 2 * ref.size // 3 / SR
    res = S.main(["--ref", str(tmp_path / "r.wav"),
                  "--deg", str(tmp_path / "d.wav"), "--kmeans", str(km),
                  "--mask", f"{t0:.3f}:{t1:.3f}"])
    assert res["files"]["d"]["uer_mask"] > 0.0
    res0 = S.main(["--ref", str(tmp_path / "r.wav"),
                   "--deg", str(tmp_path / "r.wav"), "--kmeans", str(km),
                   "--mask", f"{t0:.3f}:{t1:.3f}"])
    assert res0["files"]["r"]["uer_mask"] == 0.0
    with pytest.raises(SystemExit):   # --mask without --kmeans
        S.main(["--ref", str(tmp_path / "r.wav"),
                "--deg", str(tmp_path / "d.wav"), "--mask", "0.1:0.2"])

    with pytest.raises(SystemExit):   # pair XOR dirs
        S.main(["--ref", str(tmp_path / "r.wav")])
    with pytest.raises(SystemExit):   # one transcript can't score a dir
        S.main(["--ref-dir", str(tmp_path), "--deg-dir", str(tmp_path),
                "--text", "hello"])
    with pytest.raises(SystemExit):   # unmatched degraded filename
        (tmp_path / "only_deg").mkdir()
        (tmp_path / "empty_ref").mkdir()
        A.save_wav(tmp_path / "only_deg" / "x.wav", ref, SR)
        S.main(["--ref-dir", str(tmp_path / "empty_ref"),
                "--deg-dir", str(tmp_path / "only_deg")])
