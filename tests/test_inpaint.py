"""Informed-inpainting graph tests: splice semantics, static-shape reuse
across mask positions, and normalization parity with the reference recipe."""
import numpy as np

import jax
import jax.numpy as jnp

from speech_inpainting_tpu.infer.inpaint import (
    InformedInpainter, InpainterConfig, meanvar_normalize, peak_normalize)
from speech_inpainting_tpu.models.hifigan import HiFiGANConfig
from speech_inpainting_tpu.models.hubert import (EncoderWithHead, HubertConfig)
from speech_inpainting_tpu.models.hifigan import Generator
from speech_inpainting_tpu.ops.mel import HUBERT_ALIGNED_MEL_22K, mel_spectrogram
from speech_inpainting_tpu.ops.masking import mask_span


def tiny_inpainter(rng, k=7):
    hcfg = HubertConfig(conv_dim=(8,) * 7, hidden_size=16, num_hidden_layers=1,
                        num_attention_heads=2, intermediate_size=24,
                        num_conv_pos_embeddings=15,
                        num_conv_pos_embedding_groups=1)
    gcfg = HiFiGANConfig(upsample_rates=(8, 8, 2, 2),
                         upsample_kernel_sizes=(16, 16, 4, 4),
                         upsample_initial_channel=16,
                         resblock_kernel_sizes=(3,),
                         resblock_dilation_sizes=((1, 3),))
    centroids = rng.standard_normal((k, 80)).astype(np.float32)
    hub = EncoderWithHead(hcfg, out_dim=80)
    hp = hub.init(jax.random.PRNGKey(0), jnp.zeros((1, 3200)))["params"]
    gen = Generator(gcfg)
    gp = gen.init(jax.random.PRNGKey(1), jnp.zeros((1, 80, 8)))["params"]
    cfg = InpainterConfig(hubert=hcfg, hifigan=gcfg)
    return InpainterConfig, InformedInpainter(cfg, hp, gp, centroids), centroids


def test_inpaint_shapes_and_splice(rng):
    _, inp, centroids = tiny_inpainter(rng)
    t16, t22 = 16000, 22050
    wav16 = (rng.standard_normal(t16) * 0.1).astype(np.float32)
    wav22 = (rng.standard_normal(t22) * 0.1).astype(np.float32)
    pos, ln = 10, 5
    out = inp(wav22, wav16, pos, ln)
    n_frames = HUBERT_ALIGNED_MEL_22K.num_frames(t22)
    assert out["mel_masked"].shape == (80, n_frames)
    assert out["inpainted"].shape[0] == int(n_frames * 441 / 256) * 256
    assert np.isfinite(np.asarray(out["inpainted"])).all()

    mel_m = np.asarray(out["mel_masked"])
    mel_i = np.asarray(out["mel_inpainted"])
    # outside the mask the inpainted mel is untouched
    np.testing.assert_array_equal(mel_i[:, :pos], mel_m[:, :pos])
    np.testing.assert_array_equal(mel_i[:, pos + ln:], mel_m[:, pos + ln:])
    # inside, frames are codebook entries (centered + center = original rows)
    pred = np.asarray(out["pred_labels"])[pos:pos + ln]
    want = centroids[pred].T
    np.testing.assert_allclose(mel_i[:, pos:pos + ln], want, atol=1e-5)


def test_inpaint_no_retrace_across_masks(rng):
    _, inp, _ = tiny_inpainter(rng)
    wav16 = (rng.standard_normal(16000) * 0.1).astype(np.float32)
    wav22 = (rng.standard_normal(22050) * 0.1).astype(np.float32)
    inp(wav22, wav16, 5, 3)
    n = inp._graph._cache_size()
    inp(wav22, wav16, 20, 10)
    inp(wav22, wav16, 0, 1)
    assert inp._graph._cache_size() == n == 1


def test_expected_inpaint_uses_target_labels(rng):
    _, inp, centroids = tiny_inpainter(rng)
    wav22 = (rng.standard_normal(22050) * 0.1).astype(np.float32)
    n_frames = HUBERT_ALIGNED_MEL_22K.num_frames(22050)
    labels = rng.integers(0, len(centroids), n_frames)
    pos, ln = 8, 4
    out = inp.expected_inpaint(wav22, labels, pos, ln)
    mel_e = np.asarray(out["mel_expected"])
    want = centroids[labels[pos:pos + ln]].T
    np.testing.assert_allclose(mel_e[:, pos:pos + ln], want, atol=1e-5)


def test_normalizations_match_reference_recipes(rng):
    x = rng.standard_normal(1000).astype(np.float32) * 3.0
    got = np.asarray(peak_normalize(jnp.asarray(x)))
    want = x / np.abs(x).max() * 0.95  # librosa.util.normalize * 0.95
    np.testing.assert_allclose(got, want, atol=1e-6)

    got = np.asarray(meanvar_normalize(jnp.asarray(x)))
    want = (x - x.mean()) / np.sqrt(x.var() + 1e-7)  # HF processor
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_mask_span_conventions(rng):
    """predict.py:133 writes the 16k mask end as (pos+len)*320+79-80, which
    equals (pos+len)*320-1 — both must zero the same samples."""
    from speech_inpainting_tpu.ops.masking import mask_wave_frames
    wav = np.ones(6400, np.float32)
    pos, ln = 3, 2
    got = np.asarray(mask_wave_frames(jnp.asarray(wav), pos, ln))
    want = wav.copy()
    want[pos * 320 + 80:(pos + ln) * 320 + 79 - 80] = 0
    np.testing.assert_array_equal(got, want)


def test_batched_inpaint_sharded_matches_single(rng):
    """Serving-style SPMD: the batched graph with inputs sharded over the
    8-device mesh must reproduce the single-device outputs."""
    from speech_inpainting_tpu.parallel.mesh import make_mesh, shard_batch

    _, inp, _ = tiny_inpainter(rng)
    B = 8
    wav22 = (rng.standard_normal((B, 22050)) * 0.1).astype(np.float32)
    wav16 = (rng.standard_normal((B, 16000)) * 0.1).astype(np.float32)
    pos = rng.integers(0, 30, B).astype(np.int32)
    lens = np.full(B, 4, np.int32)

    single = inp.batch(wav22, wav16, pos, lens)

    mesh = make_mesh()
    batch = shard_batch(mesh, dict(w22=wav22, w16=wav16, p=pos, l=lens))
    sharded = inp.batch(batch["w22"], batch["w16"], batch["p"], batch["l"])
    np.testing.assert_allclose(np.asarray(sharded["inpainted"]),
                               np.asarray(single["inpainted"]), atol=1e-4)
    np.testing.assert_array_equal(np.asarray(sharded["pred_labels"]),
                                  np.asarray(single["pred_labels"]))


def test_mesh_constructed_inpainter_matches_single(rng):
    """InformedInpainter(mesh=...) — the built-in SPMD serving mode that
    replaces the reference's Pool(8) inference workers
    (I_da/scripts/inference.py:311-327) — replicates params once, shards
    every batch over 'dp', reproduces single-device outputs, and actually
    distributes the computation across all 8 devices."""
    from speech_inpainting_tpu.parallel.mesh import make_mesh

    hcfg = HubertConfig(conv_dim=(8,) * 7, hidden_size=16, num_hidden_layers=1,
                        num_attention_heads=2, intermediate_size=24,
                        num_conv_pos_embeddings=15,
                        num_conv_pos_embedding_groups=1)
    gcfg = HiFiGANConfig(upsample_rates=(8, 8, 2, 2),
                         upsample_kernel_sizes=(16, 16, 4, 4),
                         upsample_initial_channel=16,
                         resblock_kernel_sizes=(3,),
                         resblock_dilation_sizes=((1, 3),))
    centroids = rng.standard_normal((7, 80)).astype(np.float32)
    hub = EncoderWithHead(hcfg, out_dim=80)
    hp = hub.init(jax.random.PRNGKey(0), jnp.zeros((1, 3200)))["params"]
    gen = Generator(gcfg)
    gp = gen.init(jax.random.PRNGKey(1), jnp.zeros((1, 80, 8)))["params"]
    cfg = InpainterConfig(hubert=hcfg, hifigan=gcfg)
    single = InformedInpainter(cfg, hp, gp, centroids)
    meshed = InformedInpainter(cfg, hp, gp, centroids, mesh=make_mesh())

    B = 8
    wav22 = (rng.standard_normal((B, 22050)) * 0.1).astype(np.float32)
    wav16 = (rng.standard_normal((B, 16000)) * 0.1).astype(np.float32)
    pos = rng.integers(0, 30, B).astype(np.int32)
    lens = np.full(B, 4, np.int32)

    a = single.batch(wav22, wav16, pos, lens)
    b = meshed.batch(wav22, wav16, pos, lens)
    np.testing.assert_array_equal(np.asarray(a["pred_labels"]),
                                  np.asarray(b["pred_labels"]))
    np.testing.assert_allclose(np.asarray(a["inpainted"]),
                               np.asarray(b["inpainted"]), atol=1e-4)
    # the output really is distributed: one batch row per device
    assert len(b["inpainted"].sharding.device_set) == 8

    # oracle leg under the mesh too
    n_frames = HUBERT_ALIGNED_MEL_22K.num_frames(22050)
    labels = rng.integers(0, 7, (B, n_frames)).astype(np.int32)
    ea = single.batch_expected(wav22, labels, pos, lens)
    eb = meshed.batch_expected(wav22, labels, pos, lens)
    np.testing.assert_allclose(np.asarray(ea["expected_inpaint"]),
                               np.asarray(eb["expected_inpaint"]), atol=1e-4)

    # non-divisible batch (single-utterance __call__, B=1) must fall back
    # to replicated placement instead of failing the dp-shard
    one = meshed(wav22[0], wav16[0], pos[0], lens[0])
    np.testing.assert_array_equal(np.asarray(one["pred_labels"]),
                                  np.asarray(a["pred_labels"])[0])


def test_inpaint_mask_edge_cases(rng):
    """Masks past the signal end, covering everything, or empty must not
    crash, NaN, or corrupt the untouched regions."""
    _, inp, _ = tiny_inpainter(rng)
    wav16 = (rng.standard_normal(16000) * 0.1).astype(np.float32)
    wav22 = (rng.standard_normal(22050) * 0.1).astype(np.float32)
    n_frames = HUBERT_ALIGNED_MEL_22K.num_frames(22050)

    # mask extending past the end
    out = inp(wav22, wav16, n_frames - 2, 50)
    assert np.isfinite(np.asarray(out["inpainted"])).all()
    # mask covering every frame
    out = inp(wav22, wav16, 0, n_frames + 10)
    assert np.isfinite(np.asarray(out["inpainted"])).all()
    # empty mask: output mel untouched everywhere
    out = inp(wav22, wav16, 10, 0)
    np.testing.assert_array_equal(np.asarray(out["mel_inpainted"]),
                                  np.asarray(out["mel_masked"]))


def test_fast_engine_matches_flax_generator(rng):
    """InpainterConfig(fast_generator=True) — the folded weight-norm engine
    (models/hifigan_fast.py, the remove_weight_norm fold of reference
    models.py:125-132) — reproduces the flax-Generator graphs."""
    hcfg = HubertConfig(conv_dim=(8,) * 7, hidden_size=16, num_hidden_layers=1,
                        num_attention_heads=2, intermediate_size=24,
                        num_conv_pos_embeddings=15,
                        num_conv_pos_embedding_groups=1)
    gcfg = HiFiGANConfig(upsample_rates=(8, 8, 2, 2),
                         upsample_kernel_sizes=(16, 16, 4, 4),
                         upsample_initial_channel=16,
                         resblock_kernel_sizes=(3,),
                         resblock_dilation_sizes=((1, 3),))
    centroids = rng.standard_normal((7, 80)).astype(np.float32)
    hub = EncoderWithHead(hcfg, out_dim=80)
    hp = hub.init(jax.random.PRNGKey(0), jnp.zeros((1, 3200)))["params"]
    gen = Generator(gcfg)
    gp = gen.init(jax.random.PRNGKey(1), jnp.zeros((1, 80, 8)))["params"]
    slow = InformedInpainter(InpainterConfig(hubert=hcfg, hifigan=gcfg),
                             hp, gp, centroids)
    fast = InformedInpainter(InpainterConfig(hubert=hcfg, hifigan=gcfg,
                                             fast_generator=True),
                             hp, gp, centroids)
    w22 = (rng.standard_normal((2, 22050)) * 0.1).astype(np.float32)
    w16 = (rng.standard_normal((2, 16000)) * 0.1).astype(np.float32)
    pos = np.array([10, 20], np.int32)
    ln = np.array([5, 3], np.int32)
    a, b = slow.batch(w22, w16, pos, ln), fast.batch(w22, w16, pos, ln)
    np.testing.assert_array_equal(np.asarray(a["pred_labels"]),
                                  np.asarray(b["pred_labels"]))
    np.testing.assert_allclose(np.asarray(a["inpainted"]),
                               np.asarray(b["inpainted"]), atol=2e-5)
    labels = np.zeros((2, 100), np.int32)
    ea = slow.batch_expected(w22, labels, pos, ln)
    eb = fast.batch_expected(w22, labels, pos, ln)
    np.testing.assert_allclose(np.asarray(ea["expected_inpaint"]),
                               np.asarray(eb["expected_inpaint"]), atol=2e-5)


def test_evaluate_inpainting_oracle_label_guard(rng):
    """Masks overlapping frames past the oracle label track must be excluded
    from the vs-expected metrics (padded id-0 labels are fabricated), while
    the clean-reference metrics still cover every position."""
    from speech_inpainting_tpu.infer.evaluate import evaluate_inpainting
    hcfg = HubertConfig(conv_dim=(8,) * 7, hidden_size=16, num_hidden_layers=1,
                        num_attention_heads=2, intermediate_size=24,
                        num_conv_pos_embeddings=15,
                        num_conv_pos_embedding_groups=1)
    gcfg = HiFiGANConfig(upsample_rates=(8, 8, 2, 2),
                         upsample_kernel_sizes=(16, 16, 4, 4),
                         upsample_initial_channel=16,
                         resblock_kernel_sizes=(3,),
                         resblock_dilation_sizes=((1, 3),))
    centroids = rng.standard_normal((7, 80)).astype(np.float32)
    hub = EncoderWithHead(hcfg, out_dim=80)
    hp = hub.init(jax.random.PRNGKey(0), jnp.zeros((1, 3200)))["params"]
    gen = Generator(gcfg)
    gp = gen.init(jax.random.PRNGKey(1), jnp.zeros((1, 80, 8)))["params"]
    inp = InformedInpainter(InpainterConfig(hubert=hcfg, hifigan=gcfg),
                            hp, gp, centroids)
    w22 = (rng.standard_normal(44100) * 0.1).astype(np.float32)
    w16 = (rng.standard_normal(32000) * 0.1).astype(np.float32)
    labels = rng.integers(0, 7, 40).astype(np.int32)   # shorter than grid
    # positions 10 (fits: 10+5 <= 40) and 38 (overlaps the padded tail)
    m = evaluate_inpainting(inp, w22, w16, [10 * 320, 38 * 320], 100,
                            true_labels=labels)
    assert "pesq" in m and "unit_acc" in m
    # the vs-exp means must come from the single in-bounds position: with
    # both positions included the fabricated tail would drag unit_acc
    m_only = evaluate_inpainting(inp, w22, w16, [10 * 320], 100,
                                 true_labels=labels)
    np.testing.assert_allclose(m["unit_acc"], m_only["unit_acc"])
    np.testing.assert_allclose(m["mel_l1_mask"], m_only["mel_l1_mask"])
    # no position fits -> vs-exp keys absent, clean metrics present
    m_none = evaluate_inpainting(inp, w22, w16, [38 * 320], 100,
                                 true_labels=labels)
    assert "unit_acc" not in m_none and "pesq" in m_none

    # unit_scorer wiring: the UER proxy column appears and is bounded
    from speech_inpainting_tpu.metrics.units import UnitScorer

    def enc(w):
        n = (len(w) // 160) * 160
        return (w[:n].reshape(-1, 160).mean(1) > 0).astype(np.int32)

    m_uer = evaluate_inpainting(inp, w22, w16, [10 * 320], 100,
                                unit_scorer=UnitScorer(enc, rate=22050))
    assert "uer" in m_uer and m_uer["uer"] >= 0.0
