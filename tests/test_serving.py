"""PipelinedRunner: ordering, depth bounding, parity with the sync loop."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from speech_inpainting_tpu.infer.serving import PipelinedRunner  # noqa: E402


@jax.jit
def _work(x):
    return {"y": x * 2 + 1, "s": jnp.sum(x)}


def _batches(n, b=4):
    rng = np.random.default_rng(0)
    return [(jnp.asarray(rng.standard_normal((b, 8)), jnp.float32),)
            for _ in range(n)]


def test_results_match_sync_loop_in_order():
    batches = _batches(7)
    want = [jax.device_get(_work(*a)) for a in batches]
    runner = PipelinedRunner(_work, depth=3, fetch=jax.device_get)
    got = list(runner.map(batches))
    assert len(got) == len(want)
    for g, w in zip(got, want):
        np.testing.assert_allclose(g["y"], w["y"])
        np.testing.assert_allclose(g["s"], w["s"])
    assert runner.submitted == runner.completed == len(batches)


def test_depth_bounds_inflight():
    runner = PipelinedRunner(_work, depth=2)
    seen = []
    for args in _batches(6):
        n_ready = len(list(runner.submit(*args)))
        seen.append(len(runner._inflight))
        assert len(runner._inflight) <= 2
        assert n_ready in (0, 1)
    # steady state keeps the pipeline exactly full
    assert seen[-1] == 2
    assert len(list(runner.drain())) == 2
    assert runner.submitted == runner.completed == 6


def test_depth_one_is_per_batch_sync():
    runner = PipelinedRunner(_work, depth=1)
    out = list(runner.map(_batches(3)))
    assert len(out) == 3
    assert runner.throughput(1.0) > 0
