"""AOT serving artifacts: export/serialize/reload the fused inpainting graph
and match the live graph's outputs; batch polymorphism; static fallback."""
import numpy as np
import pytest

from speech_inpainting_tpu.infer.aot import (
    load_serving_artifact, save_serving_artifact)

from test_inpaint import tiny_inpainter


def _inputs(rng, B, t22=22050, t16=16000):
    wav22 = (rng.standard_normal((B, t22)) * 0.1).astype(np.float32)
    wav16 = (rng.standard_normal((B, t16)) * 0.1).astype(np.float32)
    pos = rng.integers(0, 30, B).astype(np.int32)
    lens = np.full(B, 4, np.int32)
    return wav22, wav16, pos, lens


def test_artifact_roundtrip_matches_live_graph(rng, tmp_path):
    _, inp, _ = tiny_inpainter(rng)
    meta = save_serving_artifact(tmp_path / "art", inp, 22050, 16000)
    art = load_serving_artifact(tmp_path / "art")
    assert art.meta == meta

    for B in (2, 5) if meta["poly"] else (1,):
        wav22, wav16, pos, lens = _inputs(rng, B)
        live = inp.batch(wav22, wav16, pos, lens)
        aot = art.batch(wav22, wav16, pos, lens)
        assert set(aot) == set(live)
        np.testing.assert_allclose(np.asarray(aot["inpainted"]),
                                   np.asarray(live["inpainted"]), atol=1e-5)
        np.testing.assert_array_equal(np.asarray(aot["pred_labels"]),
                                      np.asarray(live["pred_labels"]))


def test_artifact_is_self_contained(rng, tmp_path):
    """The serving process needs only the artifact directory: reload after
    the exporting objects are gone and check the files are all there."""
    _, inp, _ = tiny_inpainter(rng)
    save_serving_artifact(tmp_path / "art", inp, 22050, 16000, batch=3)
    del inp
    names = {p.name for p in (tmp_path / "art").iterdir()}
    assert names == {"graph.bin", "params.pkl", "meta.json"}
    art = load_serving_artifact(tmp_path / "art")
    assert art.meta["batch"] == 3 and not art.meta["poly"]
    wav22, wav16, pos, lens = _inputs(rng, 3)
    out = art.batch(wav22, wav16, pos, lens)
    assert np.asarray(out["inpainted"]).shape[0] == 3
    with pytest.raises(ValueError, match="exported for batch 3"):
        art.batch(*_inputs(rng, 2))
