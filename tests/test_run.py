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
