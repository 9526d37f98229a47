"""AOT serving artifacts: export the fused inpainting graph, params included.

Beyond-parity deployment subsystem (the reference ships Python sources plus
torch checkpoints and re-builds its model objects in every process,
I_ea/predict.py:117-149). Here the WHOLE serving program — mel frontend,
HuBERT, centroid splice, regrid, vocoder, one fused graph — is serialized as
StableHLO via `jax.export` next to its parameter arrays, so a serving
process can load and run it without the model source code, flax, or a
Python-side retrace. Shape-polymorphic over the batch dimension when the
graph allows it (one artifact serves any batch size); mask position/length
were already traced scalars.

Layout of an artifact directory:
    graph.bin    jax.export serialization of the batched graph
    params.pkl   numpy-ified (hubert_params, gen_params, Cc, center)
    meta.json    shapes, polymorphism, framework version
"""
from __future__ import annotations

import json
import pickle
from pathlib import Path

import numpy as np

import jax
from jax import export as jex

_FORMAT = 1


def _to_numpy(tree):
    return jax.tree_util.tree_map(np.asarray, tree)


def export_serving_graph(inpainter, t22: int, t16: int, batch=None,
                         platforms=None):
    """Export `inpainter._graph_impl` for fixed utterance lengths.

    batch=None exports with a symbolic batch dimension ("b") — one artifact
    for every batch size; an int pins it (the fallback for graphs XLA can't
    shape-polymorphise). `platforms` (e.g. ["tpu"] or ["tpu","cpu"]) requests
    cross-platform lowering so an artifact exported on one backend deploys on
    another; default is the exporting process's backend.
    Returns (Exported, params, meta dict).
    """
    hp = _to_numpy(inpainter._hubert_params)
    gp = _to_numpy(inpainter._gen_params)
    Cc = np.asarray(inpainter._C_centered)
    center = np.asarray(inpainter._center)

    poly = batch is None
    if poly:
        (b,) = jex.symbolic_shape("b")
        wav22 = jax.ShapeDtypeStruct((b, t22), np.float32)
        wav16 = jax.ShapeDtypeStruct((b, t16), np.float32)
        ints = jax.ShapeDtypeStruct((b,), np.int32)
    else:
        wav22 = jax.ShapeDtypeStruct((batch, t22), np.float32)
        wav16 = jax.ShapeDtypeStruct((batch, t16), np.float32)
        ints = jax.ShapeDtypeStruct((batch,), np.int32)

    specs = [jax.ShapeDtypeStruct(a.shape, a.dtype)
             for a in jax.tree_util.tree_leaves((hp, gp, Cc, center))]

    def fn(flat_params, wav22, wav16, pos, lens):
        treedef = jax.tree_util.tree_structure((hp, gp, Cc, center))
        hp_, gp_, Cc_, center_ = jax.tree_util.tree_unflatten(
            treedef, flat_params)
        return inpainter._graph_impl(hp_, gp_, Cc_, center_,
                                     wav22, wav16, pos, lens)

    kw = {"platforms": platforms} if platforms else {}
    exp = jex.export(jax.jit(fn), **kw)(specs, wav22, wav16, ints, ints)
    meta = {"format": _FORMAT, "t22": t22, "t16": t16,
            "batch": batch, "poly": poly,
            "platforms": list(exp.platforms)}
    return exp, (hp, gp, Cc, center), meta


def save_serving_artifact(path, inpainter, t22: int, t16: int, batch=None,
                          platforms=None):
    """Write a self-contained serving artifact directory. Tries the
    batch-polymorphic export first, falls back to static `batch` (or 1)."""
    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    try:
        exp, params, meta = export_serving_graph(inpainter, t22, t16, batch,
                                                 platforms)
    except Exception as e:
        if batch is not None:
            raise
        # shape polymorphism is best-effort (some lowerings reject symbolic
        # dims); record WHY it degraded so a static artifact is explainable
        print("aot: batch-polymorphic export failed "
              f"({type(e).__name__}: {e}); exporting static batch=1")
        exp, params, meta = export_serving_graph(inpainter, t22, t16, 1,
                                                 platforms)
        meta["poly_export_error"] = f"{type(e).__name__}: {e}"[:500]
    (path / "graph.bin").write_bytes(exp.serialize())
    with open(path / "params.pkl", "wb") as f:
        pickle.dump(params, f)
    (path / "meta.json").write_text(json.dumps(meta, indent=1))
    return meta


class ServingArtifact:
    """A loaded AOT artifact: `.batch(wav22, wav16, mask_pos, mask_len)`.

    Runs the deserialized StableHLO under jax.jit — no model source, flax
    module, or converter needed in the serving process. Params ride as jit
    arguments (donation-friendly, and never baked into the HLO — the
    HTTP-413 rule for remote-compile backends applies to artifacts too).
    """

    def __init__(self, path):
        path = Path(path)
        self.meta = json.loads((path / "meta.json").read_text())
        if self.meta.get("format") != _FORMAT:
            raise ValueError(f"unknown artifact format: {self.meta}")
        self._exp = jex.deserialize((path / "graph.bin").read_bytes())
        with open(path / "params.pkl", "rb") as f:
            params = pickle.load(f)
        # device-resident once: numpy leaves would be re-uploaded host→device
        # on EVERY call (only jax Arrays stay resident), which through the
        # tunnel would dwarf the graph itself
        self._flat = [jax.device_put(x)
                      for x in jax.tree_util.tree_leaves(params)]
        self._call = jax.jit(self._exp.call)

    def batch(self, wav22, wav16, mask_pos, mask_len):
        import jax.numpy as jnp
        b = int(np.shape(wav22)[0])
        if not self.meta["poly"] and b != self.meta["batch"]:
            raise ValueError(
                f"artifact exported for batch {self.meta['batch']}, got {b}")
        return self._call(self._flat,
                          jnp.asarray(wav22, jnp.float32),
                          jnp.asarray(wav16, jnp.float32),
                          jnp.asarray(mask_pos, jnp.int32),
                          jnp.asarray(mask_len, jnp.int32))


def load_serving_artifact(path) -> ServingArtifact:
    return ServingArtifact(path)


__all__ = ["export_serving_graph", "save_serving_artifact",
           "load_serving_artifact", "ServingArtifact"]
