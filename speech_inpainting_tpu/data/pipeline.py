"""Host→device input pipeline: background prefetch + mesh sharding.

The reference feeds training with DataLoader worker processes
(I_ea/main.py:96-101, I_da/scripts/train.py:215-232). The TPU equivalent is a
single-host thread that stages the next batch onto the device (or across a
mesh's 'dp' axis) while the current step runs — the accelerator never waits
on item-fetch I/O, and XLA overlaps the H2D copies with compute.
"""
from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def device_prefetch(batches: Iterable, *, size: int = 2,
                    mesh: Optional[Mesh] = None, axis: Optional[str] = None
                    ) -> Iterator:
    """Iterate `batches`, staging each onto the device ahead of use.

    With a mesh, batch arrays are sharded over `axis` along dim 0 (the SPMD
    data-parallel layout); without one they land on the default device.
    Under a multi-process runtime (jax.distributed) each process feeds its
    LOCAL shard of the global batch — assembled into global arrays via
    parallel.distributed.shard_host_batch (the DistributedSampler
    replacement).
    """
    if mesh is not None:
        from ..parallel.distributed import shard_host_batch
        from ..parallel.mesh import data_spec
        spec = P(axis) if axis is not None else data_spec(mesh)
        put = lambda b: shard_host_batch(mesh, b, spec)
    else:
        put = lambda b: jax.tree_util.tree_map(jax.device_put, b)

    q: "queue.Queue" = queue.Queue(maxsize=size)
    _END = object()
    err = []

    def worker():
        try:
            for b in batches:
                q.put(put(b))
        except Exception as e:          # surface loader errors to the consumer
            err.append(e)
        finally:
            q.put(_END)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _END:
            if err:
                raise err[0]
            return
        yield item
