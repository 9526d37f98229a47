"""AOT serving artifacts: export/serialize/reload the fused inpainting graph
and match the live graph's outputs; batch polymorphism; static fallback;
the iSTFT fast-engine override (the quality-gated serving default must
round-trip through the artifact path too)."""
import numpy as np
import pytest

from speech_inpainting_tpu.infer.aot import (
    load_serving_artifact, save_serving_artifact)

from test_inpaint import tiny_inpainter


def tiny_istft_inpainter(rng):
    """tiny_inpainter with the vocoder swapped for the iSTFT fast engine
    (models/hifigan_istft.py) via the generator-override hook — the same
    wiring bench.py's flagship config uses."""
    import jax
    import jax.numpy as jnp

    from speech_inpainting_tpu.infer.inpaint import (InformedInpainter,
                                                     InpainterConfig)
    from speech_inpainting_tpu.models.hifigan_istft import (
        ISTFTGenerator, ISTFTGeneratorConfig)
    from speech_inpainting_tpu.models.hubert import (EncoderWithHead,
                                                     HubertConfig)
    hcfg = HubertConfig(conv_dim=(8,) * 7, hidden_size=16,
                        num_hidden_layers=1, num_attention_heads=2,
                        intermediate_size=24, num_conv_pos_embeddings=15,
                        num_conv_pos_embedding_groups=1)
    icfg = ISTFTGeneratorConfig(upsample_rates=(8, 8),
                                upsample_kernel_sizes=(16, 16),
                                upsample_initial_channel=16,
                                resblock_kernel_sizes=(3,),
                                resblock_dilation_sizes=((1, 3),))
    centroids = rng.standard_normal((7, 80)).astype(np.float32)
    hub = EncoderWithHead(hcfg, out_dim=80)
    hp = hub.init(jax.random.PRNGKey(0), jnp.zeros((1, 3200)))["params"]
    gen = ISTFTGenerator(icfg)
    gp = gen.init(jax.random.PRNGKey(1), jnp.zeros((1, 80, 8)))["params"]
    cfg = InpainterConfig(hubert=hcfg, hifigan=icfg.trunk())
    return InformedInpainter(cfg, hp, gp, centroids, generator=gen)


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


def test_istft_engine_artifact_roundtrip(rng, tmp_path):
    """Generator-override (iSTFT fast engine) graph exports, reloads, and
    matches the live graph at two batch sizes — required before the fast
    family can be a serving default (VERDICT r3 #5)."""
    inp = tiny_istft_inpainter(rng)
    meta = save_serving_artifact(tmp_path / "art", inp, 22050, 16000)
    art = load_serving_artifact(tmp_path / "art")

    batches = (2, 5) if meta["poly"] else (meta["batch"],)
    assert len(batches) >= 2, f"poly export degraded: {meta}"
    for B in batches:
        wav22, wav16, pos, lens = _inputs(rng, B)
        live = inp.batch(wav22, wav16, pos, lens)
        aot = art.batch(wav22, wav16, pos, lens)
        assert (np.asarray(aot["inpainted"]).shape
                == np.asarray(live["inpainted"]).shape)
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
