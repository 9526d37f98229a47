"""Multi-host SPMD runtime — the scale-out leg of the distributed design.

The reference's multi-process model is `mp.spawn` + NCCL DDP with a
`DistributedSampler` feeding each rank its slice of the data
(I_ea/hifi_gan/train.py:44-46, 82-85, 296-299; `dist_config`
I_ea/hifi_gan/config_v1.json:32-36). The JAX-native analogue:

  - one process per host joins a coordination service
    (`jax.distributed.initialize`) — after which `jax.devices()` is GLOBAL
    and every jitted step is a single SPMD program over all chips;
  - the mesh is built over global devices: a flat ('dp',) axis, or
    ('dcn', 'ici') for multi-slice pods so XLA keeps the heavy collectives
    on ICI and only DCN-friendly ones cross slices;
  - each process feeds its LOCAL batch shard
    (`jax.make_array_from_process_local_data` — the DistributedSampler
    replacement); XLA inserts the gradient all-reduces DDP did by hand.

The reference dist shim's contract — works unchanged on one device
(I_da/src/modules/dist.py:21-24) — is preserved: `initialize()` is a no-op
for a single process, and every helper degrades to plain single-host
behavior.

Launch recipe (N hosts, one process each)::

    # host i of N (same command everywhere, different --process-id):
    python -m speech_inpainting_tpu.cli.train_hifigan ... \
        --coordinator host0:1234 --num-processes N --process-id i

    # TPU pods: jax.distributed.initialize() autodetects — pass
    # coordinator=None and let cluster detection fill everything in.

CPU smoke test (2 processes × 4 virtual devices — tests/test_multihost.py)::

    XLA_FLAGS=--xla_force_host_platform_device_count=4 \
      python worker.py --process-id {0,1} --num-processes 2

(On few-core hosts also raise XLA:CPU's collective-rendezvous watchdogs —
`--xla_cpu_collective_call_terminate_timeout_seconds=...` — the default
40 s LOG(FATAL)s when serialized per-device threads arrive late; see
tests/conftest.py.)
"""
from __future__ import annotations

import sys

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import make_mesh


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None,
               *, cpu_collectives: str = "gloo") -> bool:
    """Join the multi-process runtime; no-op when single-process.

    Returns True iff a multi-process runtime was initialized. Must run
    before the first jax dispatch. With all arguments None, TPU pod
    environments are autodetected (jax cluster detection); on CPU the
    cross-process collectives implementation is selected first (gloo).
    """
    if num_processes is not None and num_processes <= 1:
        return False  # the dist.py:21-24 single-process contract
    bare = (coordinator_address is None and num_processes is None
            and process_id is None)
    if bare and not _cluster_env():
        return False
    # must be set before backend init; harmless for TPU backends
    jax.config.update("jax_cpu_collectives_implementation", cpu_collectives)
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except (RuntimeError, ValueError) as e:
        if bare:
            # bare autodetect is best-effort: a single-host TPU env can
            # trip _cluster_env (e.g. TPU_WORKER_HOSTNAMES=localhost) yet
            # give jax's cluster detection no coordinator (ValueError), or
            # the backend may already be initialized (RuntimeError) —
            # joining is impossible and unnecessary, degrade to
            # single-process. Explicit args still raise. The degrade is
            # loud: on a REAL pod with a broken cluster env, N silent
            # single-process jobs would train divergently.
            print("[distributed] cluster-like env detected but bare "
                  f"autodetect failed ({type(e).__name__}: {e}); running "
                  "single-process. If this host IS part of a pod, pass "
                  "explicit coordinator_address/num_processes/process_id.",
                  file=sys.stderr, flush=True)
            return False
        raise
    return jax.process_count() > 1


def _cluster_env() -> bool:
    """True when a TPU-pod/cluster environment is detectable (lets bare
    `initialize()` autodetect instead of silently running single-process).

    Covers the variables jax's own cluster detection keys on (GCE TPU VM
    metadata surfaces as TPU_PROCESS_ADDRESSES / TPU_WORKER_ID /
    CLOUD_TPU_TASK_ID, multislice as MEGASCALE_*) — a false positive only
    costs the caught-RuntimeError fallback below, a false negative would
    silently train N disjoint single-host jobs."""
    import os
    return any(k in os.environ for k in (
        "TPU_WORKER_HOSTNAMES", "TPU_PROCESS_ADDRESSES", "TPU_WORKER_ID",
        "CLOUD_TPU_TASK_ID", "MEGASCALE_COORDINATOR_ADDRESS",
        "COORDINATOR_ADDRESS"))


def is_coordinator() -> bool:
    """Process 0 — the only one that should write checkpoints/TB logs
    (the reference gates on rank == 0, I_ea/hifi_gan/train.py:47-50)."""
    return jax.process_index() == 0


def sync_from_coordinator(tree):
    """Replicate process 0's pytree to every process — the rank-0 broadcast
    DDP performs when it wraps the model (I_ea/hifi_gan/train.py:82-85).

    Run this after checkpoint restore: on a non-shared filesystem (or after
    a torn save) some ranks may restore while others keep fresh-init
    params, and shard_host_batch(P()) would silently stitch the divergent
    copies into one "replicated" global array. No-op single-process."""
    if jax.process_count() == 1:
        return tree
    from jax.experimental import multihost_utils
    return multihost_utils.broadcast_one_to_all(tree)


def make_global_mesh(axes: Sequence[tuple] = (("dp", -1),)) -> Mesh:
    """Mesh over ALL processes' devices (jax.devices() is global after
    initialize()). Single-process: identical to parallel.mesh.make_mesh."""
    return make_mesh(axes, devices=jax.devices())


def make_hybrid_mesh(ici_axes: Sequence[tuple] = (("ici", -1),),
                     dcn_axis: str = "dcn") -> Mesh:
    """('dcn', *ici) mesh: the slow axis spans slices/hosts (DCN), the fast
    axes stay inside a slice (ICI) — shard batch over 'dcn'×'ici' for pure
    data parallel, or keep model axes on ici only (SURVEY.md §5.8 plan).
    Directly consumable as RunConfig.mesh: the training loops shard the
    batch dim over every axis of a mesh without a 'dp' axis
    (parallel.mesh.data_spec), so the pod layout needs no hand-written
    specs (tested: test_run_mesh hybrid-mesh case).

    Groups devices by slice_index when the backend reports one (multi-slice
    TPU), else by process_index (CPU/multi-host single-slice) — one group
    per slice, devices ordered identically within each.
    """
    devices = jax.devices()
    def group_of(d):
        return getattr(d, "slice_index", None) if \
            getattr(d, "slice_index", None) is not None else d.process_index
    groups = sorted({group_of(d) for d in devices})
    by_group = [[d for d in devices if group_of(d) == g] for g in groups]
    sizes = {len(g) for g in by_group}
    assert len(sizes) == 1, f"uneven slice sizes: {sorted(sizes)}"
    per = sizes.pop()

    names = [dcn_axis] + [n for n, _ in ici_axes]
    ici_sizes = [s for _, s in ici_axes]
    fixed = int(np.prod([s for s in ici_sizes if s != -1]))
    ici_sizes = [per // fixed if s == -1 else s for s in ici_sizes]
    assert int(np.prod(ici_sizes)) == per, (ici_sizes, per)
    arr = np.asarray([g for g in by_group]).reshape(
        [len(groups)] + ici_sizes)
    return Mesh(arr, tuple(names))


def shard_host_batch(mesh: Mesh, batch, spec: P = P("dp")):
    """Per-process batch shard → global sharded arrays.

    Each process passes ITS slice of the global batch (local batch =
    global/num_processes along the sharded dim); the result is one global
    jax.Array per leaf (the DistributedSampler + DDP input contract,
    I_ea/hifi_gan/train.py:96-106). Single-process: plain device_put.
    """
    sharding = NamedSharding(mesh, spec)
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, sharding), batch)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(
            sharding, np.asarray(x)), batch)


def add_cli_args(parser) -> None:
    """Attach the multi-host launch flags every training CLI shares
    (replacing the reference's dist_config + mp.spawn plumbing)."""
    g = parser.add_argument_group("multi-host")
    g.add_argument("--coordinator", default=None,
                   help="host:port of process 0 (omit on TPU pods: "
                        "autodetected)")
    g.add_argument("--num-processes", type=int, default=None)
    g.add_argument("--process-id", type=int, default=None)


def initialize_from_args(args) -> bool:
    """initialize() from parsed CLI flags; returns True when multi-process."""
    return initialize(getattr(args, "coordinator", None),
                      getattr(args, "num_processes", None),
                      getattr(args, "process_id", None))


def local_batches(batches):
    """Slice each (deterministic, globally-identical) host batch down to THIS
    process's rows — the DistributedSampler contract: every process computes
    the same global batch order from the shared seed, then feeds rows
    [pid*per, (pid+1)*per) to shard_host_batch. Single-process: passthrough.
    """
    n, i = jax.process_count(), jax.process_index()
    if n == 1:
        yield from batches
        return
    for batch in batches:
        def cut(x):
            b = x.shape[0]
            assert b % n == 0, (
                f"global batch {b} not divisible by {n} processes")
            per = b // n
            return x[i * per:(i + 1) * per]
        yield jax.tree_util.tree_map(cut, batch)


__all__ = ["initialize", "initialize_from_args", "add_cli_args",
           "is_coordinator", "local_batches", "make_global_mesh",
           "make_hybrid_mesh", "shard_host_batch", "sync_from_coordinator"]
