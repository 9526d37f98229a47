"""CPU tests for the eval harness's holdout plumbing and report merge
(examples/eval_e2e.py). The harness drives the reference's two mask-sweep
protocols (I_ea/mask_pos_len.py:32-35, I_da/scripts/inpainting.py:345-347);
these tests pin the pure-python pieces: training-set filtering for the
held-out generalization sweeps, and the report assembly EVAL_r03.json
is built from.
"""
import importlib.util
import json
import sys
import types
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]


@pytest.fixture(scope="module")
def ev():
    spec = importlib.util.spec_from_file_location(
        "eval_e2e", REPO / "examples" / "eval_e2e.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_augment_wavs_alignment(ev):
    """Pitch/speed copies must keep the 22k/16k pair frame-aligned: the
    eval stages re-extract units/f0 per copy and rely on hop 441@22k ==
    hop 320@16k == 20 ms staying true for the augmented copies (both legs
    are resampled by the SAME rational ratio)."""
    import numpy as np
    rng = np.random.default_rng(0)
    dur = 1.7
    wavs22 = {"u": rng.standard_normal(int(22050 * dur)).astype(np.float32)}
    wavs16 = {"u": rng.standard_normal(int(16000 * dur)).astype(np.float32)}
    aug22 = ev.augment_wavs(wavs22)
    aug16 = ev.augment_wavs(wavs16)
    assert set(aug22) == set(aug16)
    assert "u" in aug22 and len(aug22) == 5  # original + 4 rates
    assert np.array_equal(aug22["u"], wavs22["u"])  # originals untouched
    for name in aug22:
        w22, w16 = aug22[name], aug16[name]
        assert w22.dtype == np.float32 and w16.dtype == np.float32
        # durations stay equal across the pair -> frame grids stay aligned
        assert abs(len(w22) / 22050 - len(w16) / 16000) < 2 / 16000
        if "@" in name:
            r = float(name.split("@")[1])
            assert abs(len(w22) - len(wavs22["u"]) / r) <= 2
            assert not np.array_equal(w22[: len(wavs22["u"])],
                                      wavs22["u"][: len(w22)])


def test_drop_filters_holdout(ev):
    wavs = {"a": 1, "b": 2}
    assert ev._drop(wavs, None) is wavs
    assert ev._drop(wavs, "b") == {"a": 1}
    with pytest.raises(AssertionError):
        ev._drop({"a": 1}, "a")


def test_pseudo_speaker_wavs(ev):
    """r4 pseudo-speaker builder (verdict #2): 5 transform families as
    distinct spkr ids, identity untouched, pitch-only families preserve
    duration while resample families change it, tempo jitter stays within
    the family."""
    import numpy as np
    rng = np.random.default_rng(0)
    base = {"u": rng.standard_normal(32000).astype(np.float32),
            "v": rng.standard_normal(24000).astype(np.float32)}
    wavs, spk = ev.pseudo_speaker_wavs(base)
    assert set(spk.values()) == {0, 1, 2, 3, 4}
    assert len(wavs) == 2 * 5 * 3          # utt x family x tempo variants
    assert np.array_equal(wavs["u#s0"], base["u"])     # identity untouched
    # resample families change duration, pitch-only families preserve it
    assert abs(len(wavs["u#s1"]) - 32000 / 0.88) <= 2
    assert abs(len(wavs["u#s2"]) - 32000 / 1.12) <= 2
    for sid in (3, 4):
        assert abs(len(wavs[f"u#s{sid}"]) - 32000) <= 512  # WSOLA grid
        assert not np.array_equal(wavs[f"u#s{sid}"][:32000],
                                  base["u"][:len(wavs[f"u#s{sid}"])])
    # tempo variants keep the family id
    assert spk["u#s3~0.93"] == 3 and spk["v#s1~1.07"] == 1
    for w in wavs.values():
        assert w.dtype == np.float32 and np.isfinite(w).all()


def test_da_n_spk_marker(ev, tmp_path):
    assert ev._da_n_spk(tmp_path) == 0          # absent = single-speaker
    (tmp_path / "da_meta.json").write_text(json.dumps({"n_spk": 5}))
    assert ev._da_n_spk(tmp_path) == 5


def _sweep(ms_values, base):
    return {str(ms): {"pesq": base - i * 0.01, "stoi": 0.7}
            for i, ms in enumerate(ms_values)}


def test_report_merges_holdout_tables(ev, tmp_path):
    ea = {"protocol": "I_ea", "mean": _sweep((20, 400), 2.4)}
    da = {"protocol": "I_da", "mean": _sweep((100, 400), 2.3),
          "rtf_note": "dispatch-bound"}
    hold_ea = {"protocol": "I_ea holdout", "holdout": "x",
               "mean_holdout": _sweep((20, 400), 2.35)}
    hold_da = {"protocol": "I_da holdout", "holdout": "x",
               "mean": _sweep((100, 400), 1.7)}
    base = {"protocol": "asr-tts", "mean": _sweep((100, 400), 4.3)}
    for name, obj in [("eval_ea.json", ea), ("eval_da.json", da),
                      ("eval_ea_holdout.json", hold_ea),
                      ("eval_da_holdout.json", hold_da),
                      ("eval_baseline.json", base)]:
        (tmp_path / name).write_text(json.dumps(obj))

    args = types.SimpleNamespace(hifigan_steps=1, ea_steps=1, f0vq_steps=1,
                                 da_steps=1)
    dest = tmp_path / "report.json"
    ev.stage_report(tmp_path, args, dest=dest)
    rep = json.loads(dest.read_text())

    assert rep["I_ea"]["mean"] == ea["mean"]
    assert rep["I_ea_holdout"]["mean"] == hold_ea["mean_holdout"]
    assert rep["I_ea_holdout"]["holdout"] == "x"
    assert rep["I_da_holdout"]["mean"] == hold_da["mean"]
    assert rep["asr_tts_baseline"]["mean"] == base["mean"]
    assert "upper bound".casefold() in \
        rep["asr_tts_baseline"]["note"].casefold()
    assert rep["rtf_note"] == "dispatch-bound"
    assert "wer_cer" in rep  # the environment-blocked column is documented


def test_report_vocoder_gate_table(ev, tmp_path):
    """With a same-lineage eval_ea_v1.json present the report carries the
    two-family gate (r4 verdict #1): both means side-by-side, per-metric
    verdict averages, and the promote/keep boolean."""
    ea = {"protocol": "I_ea istft", "mean": _sweep((20, 400), 2.5)}
    v1 = {"protocol": "I_ea v1", "mean": _sweep((20, 400), 2.1)}
    da = {"protocol": "I_da", "mean": _sweep((100, 400), 2.0)}
    for name, obj in [("eval_ea.json", ea), ("eval_ea_v1.json", v1),
                      ("eval_da.json", da)]:
        (tmp_path / name).write_text(json.dumps(obj))
    args = types.SimpleNamespace(hifigan_steps=1, ea_steps=1, f0vq_steps=1,
                                 da_steps=1)
    dest = tmp_path / "report.json"
    ev.stage_report(tmp_path, args, dest=dest)
    rep = json.loads(dest.read_text())
    gate = rep["vocoder_gate"]
    assert gate["istft_mean"] == ea["mean"]
    assert gate["v1_mean"] == v1["mean"]
    assert gate["verdict"]["pesq"]["istft"] > gate["verdict"]["pesq"]["v1"]
    assert gate["istft_wins_quality_gate"] is True


@pytest.fixture(scope="module")
def bench_mod():
    spec = importlib.util.spec_from_file_location("bench", REPO / "bench.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_latest_vocoder_gate_newest_round_wins(bench_mod, tmp_path):
    """bench.py's flagship promotion must follow the NEWEST round's gate
    (r4 weak #5: a hardcoded EVAL_r04.json silently goes stale)."""
    (tmp_path / "EVAL_r04.json").write_text(json.dumps(
        {"vocoder_gate": {"istft_wins_quality_gate": True, "round": 4}}))
    (tmp_path / "EVAL_r05.json").write_text(json.dumps(
        {"vocoder_gate": {"istft_wins_quality_gate": False, "round": 5}}))
    gate, src = bench_mod.latest_vocoder_gate(tmp_path)
    assert src == "EVAL_r05.json" and gate["round"] == 5
    assert gate["istft_wins_quality_gate"] is False
    # a newer round WITHOUT a gate falls back to the newest that has one
    (tmp_path / "EVAL_r06.json").write_text(json.dumps({"no_gate": 1}))
    gate, src = bench_mod.latest_vocoder_gate(tmp_path)
    assert src == "EVAL_r05.json"
    # double-digit rounds sort numerically, not lexically
    (tmp_path / "EVAL_r10.json").write_text(json.dumps(
        {"vocoder_gate": {"round": 10}}))
    gate, src = bench_mod.latest_vocoder_gate(tmp_path)
    assert src == "EVAL_r10.json"
    # empty dir: no gate, no crash
    sub = tmp_path / "empty"
    sub.mkdir()
    gate, src = bench_mod.latest_vocoder_gate(sub)
    assert gate == {} and src is None


def _sweep5(ms_values, pesq, estoi, stoi, lsd, uer):
    return {str(ms): {"pesq": pesq, "estoi": estoi, "stoi": stoi,
                      "lsd_d2": lsd, "uer": uer} for ms in ms_values}


def test_report_gate_counts_lower_better_metrics(ev, tmp_path):
    """r4 weak #5: the gate verdict must be direction-aware over ALL five
    metrics. Here istft wins pesq + the two lower-better metrics but loses
    estoi/stoi — 3/5 wins promotes, where the old up-only tally (1/3)
    would have demoted."""
    ea = {"protocol": "istft",
          "mean": _sweep5((20, 400), 2.5, 0.5, 0.6, 5.0, 0.3)}
    v1 = {"protocol": "v1",
          "mean": _sweep5((20, 400), 2.1, 0.7, 0.8, 6.0, 0.4)}
    da = {"protocol": "I_da", "mean": _sweep((100, 400), 2.0)}
    for name, obj in [("eval_ea.json", ea), ("eval_ea_v1.json", v1),
                      ("eval_da.json", da)]:
        (tmp_path / name).write_text(json.dumps(obj))
    args = types.SimpleNamespace(hifigan_steps=1, ea_steps=1, f0vq_steps=1,
                                 da_steps=1)
    dest = tmp_path / "report.json"
    ev.stage_report(tmp_path, args, dest=dest)
    gate = json.loads(dest.read_text())["vocoder_gate"]
    assert gate["wins"] == {
        "istft": 3, "of": 5,
        "direction": {"pesq": "higher_better", "estoi": "higher_better",
                      "stoi": "higher_better", "lsd_d2": "lower_better",
                      "uer": "lower_better"}}
    assert gate["istft_wins_quality_gate"] is True
    # flip the lower-better metrics: istft now wins only pesq (1/5)
    v1["mean"] = _sweep5((20, 400), 2.1, 0.7, 0.8, 4.0, 0.2)
    (tmp_path / "eval_ea_v1.json").write_text(json.dumps(v1))
    ev.stage_report(tmp_path, args, dest=dest)
    gate = json.loads(dest.read_text())["vocoder_gate"]
    assert gate["wins"]["istft"] == 1
    assert gate["istft_wins_quality_gate"] is False


def test_gan_lineage_save_restore(ev, tmp_path):
    """The committable-lineage resume (r5 verdict #1): g_params survive
    exactly, disc params survive at f16 precision, step carries over, and
    the optimizer moments are fresh (the documented
    warm-start-with-discriminators semantics)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from speech_inpainting_tpu.train.gan import GANConfig, create_gan_state

    k = jax.random.PRNGKey(0)
    gp = {"w": jax.random.normal(k, (4, 4))}
    dp = {"w": jax.random.normal(jax.random.PRNGKey(1), (64,))}
    sp = {"u": jnp.ones((2,))}
    state = create_gan_state(GANConfig(), gp, {"m": dp}, {"s": dp}, sp)
    state = state.replace(step=jnp.asarray(12000, jnp.int32))
    path = tmp_path / "lineage.pkl"
    ev._save_gan_lineage(path, state)
    assert path.stat().st_size < 3000          # no optimizer moments inside

    fresh = create_gan_state(GANConfig(), {"w": jnp.zeros((4, 4))},
                             {"m": {"w": jnp.zeros((64,))}},
                             {"s": {"w": jnp.zeros((64,))}}, sp)
    restored = ev._restore_gan_lineage(fresh, path)
    assert int(restored.step) == 12000
    np.testing.assert_array_equal(np.asarray(restored.g_params["w"]),
                                  np.asarray(gp["w"]))   # g exact (f32)
    got = np.asarray(restored.d_params["mpd"]["m"]["w"])
    assert got.dtype == np.float32             # restored to f32 compute
    np.testing.assert_allclose(got, np.asarray(dp["w"]), rtol=2e-3,
                               atol=1e-5)
    # optimizer state is the FRESH one (moments zeroed), structure intact
    assert (jax.tree.structure(restored.g_opt)
            == jax.tree.structure(state.g_opt))
    for leaf in jax.tree.leaves(restored.g_opt):
        np.testing.assert_array_equal(np.asarray(leaf),
                                      np.zeros_like(np.asarray(leaf)))


def test_pseudo_speaker_wavs_k_sizes_family_set(ev):
    """ADVICE r4 #2: --pseudo-speakers K must emit exactly K families with
    ids 0..K-1 (an id >= K would silently clamp into the last Embedding
    row and alias voices)."""
    import numpy as np
    base = {"u": np.random.default_rng(0)
            .standard_normal(32000).astype(np.float32)}
    wavs, spk = ev.pseudo_speaker_wavs(base, k=2)
    assert set(spk.values()) == {0, 1}
    assert len(wavs) == 1 * 2 * 3
    with pytest.raises(AssertionError):
        ev.pseudo_speaker_wavs(base, k=6)
    with pytest.raises(AssertionError):
        ev.pseudo_speaker_wavs(base, k=0)


def test_gan_state_pickle_resume_roundtrip(tmp_path):
    """--extend's contract: a GANTrainState survives a device_get + pickle
    round trip with every leaf (params, BOTH optimizer states, step) exactly
    preserved, and a generator-only warm start (.replace) leaves optimizer
    state fresh — the two resume paths stage_hifigan/stage_da now offer
    (reference g_/do_ resume I_ea/hifi_gan/train.py:62-80 vs --warm-start
    train_modified.py:72-93)."""
    import pickle

    import jax
    import jax.numpy as jnp
    import numpy as np
    from speech_inpainting_tpu.train.gan import GANConfig, create_gan_state

    k = jax.random.PRNGKey(0)
    gp = {"w": jax.random.normal(k, (4, 4))}
    dp = {"w": jnp.ones((3,))}
    sp = {"u": jnp.ones((2,))}
    state = create_gan_state(GANConfig(), gp, dp, dp, sp)
    state = state.replace(step=jnp.asarray(7, jnp.int32))

    blob = pickle.dumps(jax.device_get(state))
    restored = pickle.loads(blob)
    assert int(restored.step) == 7
    la, lb = jax.tree.leaves(state), jax.tree.leaves(restored)
    assert len(la) == len(lb)
    for a, b in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # the pytree STRUCTURE (incl. optax state classes) must also survive,
    # or the jitted step would retrace/fail on the restored state
    assert (jax.tree.structure(state) == jax.tree.structure(restored))

    warm = create_gan_state(GANConfig(), {"w": jnp.zeros((4, 4))}, dp, dp,
                            sp).replace(g_params=restored.g_params)
    np.testing.assert_array_equal(np.asarray(warm.g_params["w"]),
                                  np.asarray(gp["w"]))
    assert int(warm.step) == 0  # fresh schedule, fresh optimizers


def test_report_without_optional_tables(ev, tmp_path):
    (tmp_path / "eval_ea.json").write_text(json.dumps(
        {"protocol": "I_ea", "mean": _sweep((20,), 2.4)}))
    (tmp_path / "eval_da.json").write_text(json.dumps(
        {"protocol": "I_da", "mean": _sweep((100,), 2.3)}))
    args = types.SimpleNamespace(hifigan_steps=1, ea_steps=1, f0vq_steps=1,
                                 da_steps=1)
    dest = tmp_path / "report.json"
    ev.stage_report(tmp_path, args, dest=dest)
    rep = json.loads(dest.read_text())
    for k in ("I_ea_holdout", "I_da_holdout", "asr_tts_baseline",
              "rtf_note"):
        assert k not in rep
