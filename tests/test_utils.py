"""Utils tests: checkpoint save/scan/restore (incl. GAN pair + partial
restore) and the typed config tree."""
import dataclasses
import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from speech_inpainting_tpu.utils.checkpoints import (Checkpointer,
                                                     checkpoint_step,
                                                     restore_gan_checkpoint,
                                                     save_gan_checkpoint,
                                                     scan_checkpoint)
from speech_inpainting_tpu.utils.config import (build, load_config, merge,
                                                save_config, to_dict)


def test_scan_checkpoint(tmp_path):
    assert scan_checkpoint(tmp_path, "g_") is None
    for s in (100, 2500, 900):
        (tmp_path / f"g_{s:08d}").mkdir()
    (tmp_path / "do_00009999").mkdir()
    best = scan_checkpoint(tmp_path, "g_")
    assert best.endswith("g_00002500")
    assert checkpoint_step(best) == 2500


def test_checkpointer_roundtrip(tmp_path, rng):
    ckpt = Checkpointer(tmp_path)
    tree = {"a": rng.standard_normal((3, 4)).astype(np.float32),
            "b": {"c": np.arange(5)}}
    ckpt.save("g_", 42, tree, wait=True)
    template = jax.tree_util.tree_map(np.zeros_like, tree)
    out = ckpt.restore("g_", template)
    np.testing.assert_array_equal(out["a"], tree["a"])
    np.testing.assert_array_equal(out["b"]["c"], tree["b"]["c"])
    assert ckpt.restore("nope_", template) is None


def test_gan_checkpoint_pair_and_partial_restore(tmp_path, rng):
    from speech_inpainting_tpu.train.gan import GANTrainState

    def leaf():
        return rng.standard_normal((2, 2)).astype(np.float32)

    state = GANTrainState(
        step=jnp.asarray(7), g_params={"w": leaf()},
        d_params={"mpd": {"w": leaf()}, "msd": {"w": leaf()}},
        spectral={"u": leaf()}, g_opt={"m": leaf()}, d_opt={"m": leaf()})
    ckpt = Checkpointer(tmp_path)
    save_gan_checkpoint(ckpt, state, 7, wait=True)

    blank = jax.tree_util.tree_map(jnp.zeros_like, state)
    restored, had_g, had_do = restore_gan_checkpoint(ckpt, blank)
    assert had_g and had_do
    np.testing.assert_array_equal(np.asarray(restored.g_params["w"]),
                                  np.asarray(state.g_params["w"]))
    np.testing.assert_array_equal(np.asarray(restored.d_params["msd"]["w"]),
                                  np.asarray(state.d_params["msd"]["w"]))
    assert int(restored.step) == 7

    # generator-only warm start (train_modified.py partial restore)
    ckpt2 = Checkpointer(tmp_path / "gonly")
    ckpt2.save("g_", 3, {"generator": state.g_params}, wait=True)
    restored2, had_g2, had_do2 = restore_gan_checkpoint(ckpt2, blank)
    assert had_g2 and not had_do2
    np.testing.assert_array_equal(np.asarray(restored2.g_params["w"]),
                                  np.asarray(state.g_params["w"]))
    assert int(restored2.step) == 0


@dataclasses.dataclass(frozen=True)
class Inner:
    lr: float = 1e-4
    sizes: tuple = (1, 2)


@dataclasses.dataclass(frozen=True)
class Outer:
    name: str = "x"
    inner: Inner = Inner()
    n: int = 3


def test_config_build_merge_precedence(tmp_path):
    cfg = build(Outer, {"name": "y", "inner": {"lr": 2e-3}})
    assert cfg.name == "y" and cfg.inner.lr == 2e-3 and cfg.inner.sizes == (1, 2)

    f1 = tmp_path / "a.json"
    f1.write_text(json.dumps({"n": 5, "inner": {"sizes": [4, 5, 6]}}))
    f2 = tmp_path / "b.yaml"
    f2.write_text("inner:\n  lr: 0.5\n")
    cfg = load_config(Outer, f1, f2, overrides={"name": "z"})
    assert cfg.n == 5 and cfg.inner.sizes == (4, 5, 6)
    assert cfg.inner.lr == 0.5 and cfg.name == "z"   # later sources win

    with pytest.raises(KeyError):
        merge(Outer, cfg, {"bogus": 1})

    out = tmp_path / "resolved.json"
    save_config(cfg, out)
    assert json.loads(out.read_text())["inner"]["lr"] == 0.5
    assert to_dict(cfg)["n"] == 5


def test_shipped_config_presets_are_consumable():
    """configs/*.json must build the corresponding model configs."""
    import json
    from pathlib import Path
    from speech_inpainting_tpu.models.codegen import (CodeGeneratorConfig,
                                                      FoVQVAEConfig)
    from speech_inpainting_tpu.models.hifigan import HiFiGANConfig

    root = Path(__file__).resolve().parents[1] / "configs"
    h = json.loads((root / "hifigan_v1.json").read_text())
    g = HiFiGANConfig.from_dict(h)
    assert g.total_upsample == h["hop_size"] == 256

    # V1/V2/V3 follow the reference presets (I_ea/hifi_gan/config_v{1,2,3}
    # .json): V2 = V1 at width 128, V3 = ResBlock2 at x256 upsample.
    h2 = json.loads((root / "hifigan_v2.json").read_text())
    g2 = HiFiGANConfig.from_dict(h2)
    assert g2.upsample_initial_channel == 128 and g2.total_upsample == 256

    h3 = json.loads((root / "hifigan_v3.json").read_text())
    g3 = HiFiGANConfig.from_dict(h3)
    assert g3.resblock == "2" and g3.total_upsample == 256

    hm = json.loads((root / "hifigan_ft_modified.json").read_text())
    assert hm["segment_size"] == 44288 and hm["mask_len"] == 20

    d = json.loads((root / "da_hubert100_lut.json").read_text())
    c = CodeGeneratorConfig.from_dict(d)
    assert c.hifigan.in_dim == 384 and c.hifigan.total_upsample == 320
    assert c.f0_quantizer is not None and c.f0_quantizer.l_bins == 20

    f = json.loads((root / "f0_vqvae.json").read_text())
    fc = FoVQVAEConfig.from_dict(f)
    assert fc.emb_width == 128 and fc.encoder.total_stride == 16


def test_differenced_time_cancels_constant_cost():
    """Loop-count differencing recovers per-iteration time under a large
    constant per-window cost, and refuses (None) when noise makes the delta
    non-credible instead of clamping it (the clamp once turned congestion
    noise into a ~1e12 'throughput')."""
    from speech_inpainting_tpu.utils.timing import differenced_time

    # ideal tunnel: 25 s constant readback + 0.1 s per iteration
    dt = differenced_time(lambda n: 25.0 + 0.1 * n)
    assert dt is not None and abs(dt - 0.1) < 1e-9

    # pathological noise: long window happens to beat the short one
    seen = []

    def noisy(n):
        seen.append(n)
        return 30.0 if n <= 2 else 6.0

    assert differenced_time(noisy) is None
    assert len(seen) == 3 * 2 * 2      # retried `attempts` times

    # delta exceeding the short window's own per-iter bound is rejected too
    assert differenced_time(lambda n: {2: 0.2, 12: 10.0}[n]) is None


def test_persistent_cache_is_machine_keyed(tmp_path):
    """Cross-host XLA:CPU AOT entries SIGILL when machine features differ;
    the cache dir must be keyed by a stable fingerprint of this host."""
    from speech_inpainting_tpu.utils.cache import (enable_persistent_cache,
                                                   machine_fingerprint)
    fp = machine_fingerprint()
    assert fp == machine_fingerprint()          # stable
    assert len(fp) == 16 and int(fp, 16) >= 0   # hex slug
    path = enable_persistent_cache(str(tmp_path / "xla"))
    assert path.endswith(fp)
    import os
    assert os.path.isdir(path)
    # restore the suite-wide cache dir for subsequent tests
    enable_persistent_cache()


def test_differenced_or_fallback():
    """The shared fallback policy for bench.py/bench_train.py: credible
    delta -> (delta, True); congestion-clamped delta -> (fallback, False)."""
    from speech_inpainting_tpu.utils.timing import differenced_or_fallback

    t_per, const = 0.01, 5.0
    good = lambda n: const + n * t_per
    dt, ok = differenced_or_fallback(good, 99.0)
    assert ok and abs(dt - t_per) < 1e-9
    # negative delta (noise) on every attempt -> fallback, marked
    calls = iter([10.0, 9.0] * 40)
    bad = lambda n: next(calls)
    dt, ok = differenced_or_fallback(bad, 0.5, n1=2, n2=12)
    assert not ok and dt == 0.5
