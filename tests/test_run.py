"""Loop-runner tests with a stub train step: checkpoint/resume wiring,
interval validation, step caps; plus profiling meter sanity."""
import numpy as np

import jax
import jax.numpy as jnp

from speech_inpainting_tpu.train.gan import GANTrainState
from speech_inpainting_tpu.train.run import (RunConfig, run_ea_training,
                                             run_gan_training)
from speech_inpainting_tpu.utils.profiling import (ThroughputMeter,
                                                   estimate_cost, measure)


def stub_state():
    z = lambda: jnp.zeros((2, 2))
    return GANTrainState(step=jnp.asarray(0), g_params={"w": z()},
                         d_params={"mpd": {"w": z()}, "msd": {"w": z()}},
                         spectral={"u": z()}, g_opt={"m": z()},
                         d_opt={"m": z()})


def stub_step(state, batch):
    new = GANTrainState(step=state.step + 1,
                        g_params={"w": state.g_params["w"] + batch["x"].sum()},
                        d_params=state.d_params, spectral=state.spectral,
                        g_opt=state.g_opt, d_opt=state.d_opt)
    return new, {"loss_gen_all": batch["x"].sum(), "loss_disc": jnp.asarray(0.0)}


def batches(n):
    def make(epoch):
        return iter([{"x": np.full((1,), 1.0, np.float32)}
                     for _ in range(n)])
    return make


def test_run_gan_training_and_resume(tmp_path):
    run = RunConfig(epochs=2, checkpoint_dir=str(tmp_path),
                    checkpoint_interval=3, validation_interval=100,
                    stdout_interval=100)
    state = run_gan_training(stub_step, stub_state(), batches(4), run)
    assert int(state.step) == 8
    # resume picks up the final checkpoint
    state2 = run_gan_training(stub_step, stub_state(), batches(2),
                              RunConfig(epochs=1,
                                        checkpoint_dir=str(tmp_path),
                                        checkpoint_interval=100,
                                        stdout_interval=100))
    assert int(state2.step) == 8 + 2


def test_run_gan_training_step_cap(tmp_path):
    run = RunConfig(epochs=10, checkpoint_dir=str(tmp_path),
                    checkpoint_interval=1000, training_steps=5,
                    stdout_interval=100)
    state = run_gan_training(stub_step, stub_state(), batches(4), run)
    assert int(state.step) == 5


def test_run_ea_training_best_checkpoint(tmp_path):
    from flax import struct

    class S(struct.PyTreeNode):
        step: jnp.ndarray
        params: dict
        opt_state: dict

    def step(state, batch):
        return S(step=state.step + 1, params=state.params,
                 opt_state=state.opt_state), {"loss": jnp.asarray(1.0)}

    accs = iter([0.1, 0.9, 0.5, 0.2])

    def ev(params, vb):
        return {"cos_sim_acc": next(accs), "loss": 0.0}

    run = RunConfig(epochs=1, checkpoint_dir=str(tmp_path),
                    validation_interval=2, stdout_interval=100)
    state = S(step=jnp.asarray(0), params={"w": jnp.ones(2)},
              opt_state={"m": jnp.zeros(2)})
    run_ea_training(step, ev, state, batches(8),
                    lambda epoch: iter([{"x": np.zeros(1)}]), run)
    assert (tmp_path / "best_00000000").exists()
    assert (tmp_path / "last_00000000").exists()


def test_throughput_meter():
    m = ThroughputMeter(window=10)
    for _ in range(5):
        m.step(audio_seconds=2.0)
    assert m.steps_per_sec > 0
    assert m.audio_sec_per_sec > 0


def test_estimate_and_measure_cost():
    def f(a, b):
        return a @ b
    a = jnp.ones((128, 128))
    cost = estimate_cost(f, a, a)
    assert cost.get("flops") is None or cost["flops"] > 0
    out = measure(f, a, a, iters=2)
    assert out["seconds"] > 0


def test_preemption_saves_and_resumes_gan(tmp_path):
    """SIGTERM mid-epoch: the runner checkpoints and exits cleanly; a rerun
    resumes losslessly (same end state as an uninterrupted run)."""
    import os
    import signal

    def killing_batches(epoch):
        def gen():
            for i in range(10):
                if i == 3:
                    os.kill(os.getpid(), signal.SIGTERM)
                yield {"x": np.full((1,), 1.0, np.float32)}
        return gen()

    run = RunConfig(epochs=1, checkpoint_dir=str(tmp_path),
                    checkpoint_interval=1000, validation_interval=1000,
                    stdout_interval=100)
    state = run_gan_training(stub_step, stub_state(), killing_batches, run)
    s_pre = int(state.step)
    assert 0 < s_pre < 10                       # exited early, after a save
    # resume: a fresh run with 10 more batches continues from the checkpoint
    state2 = run_gan_training(stub_step, stub_state(), batches(10), run)
    assert int(state2.step) == s_pre + 10
    # lossless: w accumulated exactly one batch-sum per executed step
    np.testing.assert_allclose(np.asarray(state2.g_params["w"]),
                               np.zeros((2, 2)) + (s_pre + 10))


def test_ea_full_state_resume(tmp_path):
    """run_ea_training persists ea_* (params+opt+step) and resumes from it
    (the reference restarts from bare weights only, main.py:259-273)."""
    from flax import struct

    class S(struct.PyTreeNode):
        step: jnp.ndarray
        params: dict
        opt_state: dict

    def step(state, batch):
        return S(step=state.step + 1,
                 params={"w": state.params["w"] + batch["x"].sum()},
                 opt_state={"m": state.opt_state["m"] + 1.0}), \
            {"loss": jnp.asarray(1.0)}

    ev = lambda params, vb: {"cos_sim_acc": 0.0}  # noqa: E731
    init = lambda: S(step=jnp.asarray(0), params={"w": jnp.zeros(2)},  # noqa: E731
                     opt_state={"m": jnp.zeros(2)})
    run = RunConfig(epochs=1, checkpoint_dir=str(tmp_path),
                    validation_interval=1000, stdout_interval=100)
    s1 = run_ea_training(step, ev, init(), batches(4),
                         lambda e: iter([]), run)
    assert int(s1.step) == 4
    # second run starts from the saved FULL state, including opt_state
    s2 = run_ea_training(step, ev, init(), batches(3),
                         lambda e: iter([]), run)
    assert int(s2.step) == 7
    np.testing.assert_allclose(np.asarray(s2.opt_state["m"]),
                               np.zeros(2) + 7)


def test_abort_nonfinite_stops_gan_loop(tmp_path):
    """RunConfig.abort_nonfinite: when a step's 'nonfinite_skips' metric
    (train/guard.py consecutive-skip counter) exceeds the budget at a
    stdout_interval boundary, the loop checkpoints the still-finite state
    and raises instead of burning accelerator time on skipped updates."""
    import pytest

    def nan_step(state, batch):
        new, m = stub_step(state, batch)
        m["nonfinite_skips"] = state.step + 1     # ever-growing streak
        return new, m

    run = RunConfig(epochs=1, checkpoint_dir=str(tmp_path),
                    stdout_interval=1, abort_nonfinite=2)
    with pytest.raises(RuntimeError, match="consecutive updates"):
        run_gan_training(nan_step, stub_state(), batches(10), run)
    # the abort saved a checkpoint of the pre-nan params first
    assert any(p.name.startswith("g_") for p in tmp_path.iterdir())

    # under budget: the loop completes
    def skipping_step(state, batch):
        new, m = stub_step(state, batch)
        m["nonfinite_skips"] = jnp.asarray(1)     # short streaks only
        return new, m
    run_gan_training(skipping_step, stub_state(), batches(5),
                     RunConfig(epochs=1, checkpoint_dir=str(tmp_path),
                               stdout_interval=1, abort_nonfinite=2))
