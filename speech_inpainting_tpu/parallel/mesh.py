"""Device mesh + sharding helpers — the SPMD replacement for the reference's
torch.distributed/NCCL stack (I_da/src/modules/dist.py, DDP in
I_ea/hifi_gan/train.py:44-85).

The contract of the reference dist shim — "works unchanged on one device" —
holds automatically: a 1-device mesh makes every collective a no-op. Gradient
all-reduce (DDP) falls out of jit-ing a train step whose batch is sharded over
the 'dp' axis while params are replicated; XLA inserts the psums over ICI.
Multi-slice scale-out stacks a 'dcn' axis in front with the same code.
"""
from __future__ import annotations

from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(axes: Sequence[tuple] = (("dp", -1),),
              devices=None) -> Mesh:
    """Build a Mesh from (name, size) pairs; size -1 absorbs the remainder.

    make_mesh() -> all devices on one 'dp' axis.
    make_mesh((("dp", -1), ("tp", 2))) -> 2-way tensor axis innermost (ICI
    neighbors), data parallel across the rest.
    """
    devices = list(jax.devices()) if devices is None else list(devices)
    names = [n for n, _ in axes]
    sizes = [s for _, s in axes]
    n = len(devices)
    fixed = int(np.prod([s for s in sizes if s != -1]))
    sizes = [n // fixed if s == -1 else s for s in sizes]
    assert int(np.prod(sizes)) == n, (sizes, n)
    arr = np.asarray(devices).reshape(sizes)
    return Mesh(arr, tuple(names))


def data_spec(mesh: Mesh) -> P:
    """The batch-dim PartitionSpec for data parallelism on `mesh`:
    P('dp') when a 'dp' axis exists (possibly alongside 'tp' etc.), else
    the batch dim shards jointly over EVERY axis — which makes the
    ('dcn','ici') hybrid pod mesh (make_hybrid_mesh) consumable by the
    training loops, not just by hand-written specs."""
    if "dp" in mesh.axis_names:
        return P("dp")
    return P(mesh.axis_names)


def data_sharding(mesh: Mesh, axis: str = None) -> NamedSharding:
    """Shard the leading (batch) dim, replicate the rest. axis=None picks
    the mesh's natural data layout (data_spec)."""
    return NamedSharding(mesh, P(axis) if axis is not None else
                         data_spec(mesh))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, axis: str = None):
    """Place a host pytree of arrays with the batch dim sharded over `axis`
    (None -> the mesh's natural data layout, see data_spec)."""
    s = data_sharding(mesh, axis)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), batch)


def replicate(mesh: Mesh, tree):
    r = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, r), tree)
