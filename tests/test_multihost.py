"""Multi-host (multi-process) SPMD: 2 CPU processes × 4 virtual devices must
compute the SAME training step as one process × 8 devices.

This is the JAX-native analogue of the reference's mp.spawn + NCCL DDP path
(I_ea/hifi_gan/train.py:44-46, 296-299): each process feeds its local batch
shard (jax.make_array_from_process_local_data, replacing DistributedSampler)
and GSPMD supplies the gradient all-reduce DDP did by hand.
"""
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

import jax
from jax.sharding import PartitionSpec as P

sys.path.insert(0, os.path.dirname(__file__))
import multihost_worker  # noqa: E402

from speech_inpainting_tpu.parallel.distributed import (  # noqa: E402
    is_coordinator, make_hybrid_mesh, shard_host_batch)
from speech_inpainting_tpu.parallel.mesh import make_mesh  # noqa: E402


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _launch_workers(tmp_path, n_proc=2, local_devices=4, hybrid=False):
    port = _free_port()
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # worker forces cpu via jax.config
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={local_devices}"
        # 1-core host: raise XLA:CPU's 40 s collective-rendezvous watchdog
        # (see conftest.py) — with 2 processes x 4 devices sharing the core,
        # arrival skew is even larger than in-process
        " --xla_cpu_collective_call_warn_stuck_timeout_seconds=300"
        " --xla_cpu_collective_call_terminate_timeout_seconds=1200"
        " --xla_cpu_collective_timeout_seconds=1200")
    repo = str(Path(__file__).parents[1])
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    outs, procs = [], []
    for pid in range(n_proc):
        out = tmp_path / f"proc{pid}.npz"
        outs.append(out)
        cmd = [sys.executable, str(Path(__file__).parent /
                                   "multihost_worker.py"),
               "--coordinator", f"localhost:{port}",
               "--num-processes", str(n_proc), "--process-id", str(pid),
               "--out", str(out)]
        if hybrid:
            cmd.append("--hybrid")
        procs.append(subprocess.Popen(
            cmd, env=env, cwd=str(Path(__file__).parents[1]),
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    fail = []
    for pid, p in enumerate(procs):
        try:
            out_bytes, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            p.kill()
            out_bytes, _ = p.communicate()
            fail.append((pid, "timeout", out_bytes))
            continue
        if p.returncode != 0:
            fail.append((pid, p.returncode, out_bytes))
    assert not fail, "\n".join(
        f"proc {pid} rc={rc}:\n{ob.decode(errors='replace')[-3000:]}"
        for pid, rc, ob in fail)
    return [dict(np.load(o)) for o in outs]


def _single_process_reference():
    step, state, batch = multihost_worker.build_step()
    mesh = make_mesh((("dp", -1),), devices=jax.devices()[:8])
    new_state, metrics = multihost_worker.run_step(mesh, step, state, batch)
    return multihost_worker.summarize(new_state, metrics)


@pytest.fixture(scope="module")
def ref_summary():
    return _single_process_reference()


def test_two_process_step_matches_single_process(tmp_path, ref_summary):
    got = _launch_workers(tmp_path, n_proc=2, local_devices=4)
    # both processes hold the same replicated result
    for key in ref_summary:
        np.testing.assert_allclose(got[0][key], got[1][key], rtol=1e-6,
                                   err_msg=key)
    assert got[0]["is_coordinator"] == 1.0
    assert got[1]["is_coordinator"] == 0.0
    for key, want in ref_summary.items():
        np.testing.assert_allclose(got[0][key], want, rtol=2e-5, atol=1e-7,
                                   err_msg=key)


def test_two_process_hybrid_mesh_matches(tmp_path, ref_summary):
    """('dcn','ici') hybrid mesh (process-grouped) computes the same step."""
    got = _launch_workers(tmp_path, n_proc=2, local_devices=4, hybrid=True)
    for key, want in ref_summary.items():
        np.testing.assert_allclose(got[0][key], want, rtol=2e-5, atol=1e-7,
                                   err_msg=key)


def test_hybrid_mesh_single_process_shape():
    """Single process: one 'dcn' group holding all devices; helpers degrade
    to single-host behavior (the dist.py:21-24 contract)."""
    mesh = make_hybrid_mesh()
    assert mesh.axis_names == ("dcn", "ici")
    assert mesh.devices.shape == (1, len(jax.devices()))
    assert is_coordinator()
    batch = {"x": np.arange(8, dtype=np.float32)}
    out = shard_host_batch(mesh, batch, P(("dcn", "ici")))
    np.testing.assert_array_equal(np.asarray(out["x"]), batch["x"])


def test_local_batches_single_process_passthrough():
    from speech_inpainting_tpu.parallel.distributed import local_batches
    batches = [{"x": np.arange(8).reshape(8, 1)} for _ in range(3)]
    got = list(local_batches(iter(batches)))
    assert len(got) == 3
    np.testing.assert_array_equal(got[0]["x"], batches[0]["x"])


def test_initialize_single_process_noop():
    """num_processes<=1 (and a bare call outside any cluster env) must be a
    no-op — the reference dist shim's works-on-one-device contract
    (I_da/src/modules/dist.py:21-24)."""
    from speech_inpainting_tpu.parallel.distributed import initialize
    assert initialize(num_processes=1) is False
    assert initialize() is False


def test_initialize_bare_degrades_in_lying_single_host_env(tmp_path):
    """A single-host TPU env that sets cluster-looking vars (the sandbox's
    sitecustomize exports TPU_WORKER_HOSTNAMES=localhost) trips
    _cluster_env, and jax's cluster detection then finds no coordinator
    and raises ValueError — bare initialize() must swallow that and
    degrade to single-process instead of crashing every training CLI.
    Run in a subprocess: jax.distributed.initialize mutates process-global
    state."""
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["TPU_WORKER_HOSTNAMES"] = "localhost"
    repo = str(Path(__file__).parents[1])
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "from speech_inpainting_tpu.parallel.distributed import initialize\n"
        "assert initialize() is False\n"
        "assert jax.process_count() == 1\n"
        "import jax.numpy as jnp\n"
        "assert float(jnp.ones(4).sum()) == 4.0\n"
        "print('degraded ok')\n")
    p = subprocess.run([sys.executable, "-c", code], env=env,
                       cwd=repo, capture_output=True, timeout=300)
    assert p.returncode == 0, p.stdout.decode() + p.stderr.decode()
    assert b"degraded ok" in p.stdout
