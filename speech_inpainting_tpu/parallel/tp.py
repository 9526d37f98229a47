"""Tensor-parallel sharding recipe for the HuBERT transformer.

The reference has no tensor parallelism (SURVEY.md §2.4: absent — its models
fit one GPU). This module is the TPU-native scale-out knob for when they
don't: Megatron-style intra-layer sharding of the attention and MLP blocks
over a 'tp' mesh axis, expressed purely as *parameter placements*
(NamedSharding) — the train/infer step functions are untouched, and GSPMD
derives the activation shardings and inserts the all-reduces that
Megatron/NCCL would issue by hand:

  - q/k/v projections: output (head) dim sharded  → each shard computes its
    own heads; the (B, T, H)→(B, T, nh, hd) reshape keeps the shard on nh.
  - out_proj / MLP output: INPUT dim sharded → each shard holds a partial
    sum; XLA inserts one psum over 'tp' per block (the Megatron f/g pair).
  - MLP intermediate: output dim sharded (GELU applies shard-local).
  - Everything else (conv frontend, LayerNorms, pos-conv, head) replicated.

Composes with data parallelism on the same mesh: params replicated over
'dp' and sharded over 'tp', batch sharded over 'dp' (parallel.mesh /
parallel.distributed helpers). num_attention_heads must divide by the tp
axis size (the head reshape is the unit of sharding).

Equivalence with single-device training is pinned by tests/test_tp.py.
"""
from __future__ import annotations

import re

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# First match wins; unmatched leaves replicate. Paths are '/'-joined key
# paths into the params tree (torch-layout names, models/hubert.py).
TP_RULES = (
    (re.compile(r"attention/(q|k|v)_proj/kernel$"), P(None, "tp")),
    (re.compile(r"attention/(q|k|v)_proj/bias$"), P("tp")),
    (re.compile(r"attention/out_proj/kernel$"), P("tp", None)),
    (re.compile(r"feed_forward/intermediate_dense/kernel$"), P(None, "tp")),
    (re.compile(r"feed_forward/intermediate_dense/bias$"), P("tp")),
    (re.compile(r"feed_forward/output_dense/kernel$"), P("tp", None)),
)


def _path_str(path) -> str:
    return "/".join(p.key if hasattr(p, "key") else str(p) for p in path)


def tp_spec(path_str: str, axis: str = "tp") -> P:
    """PartitionSpec for one param path (replicated when no rule matches)."""
    for pat, spec in TP_RULES:
        if pat.search(path_str):
            if axis == "tp":
                return spec
            return P(*[axis if a == "tp" else a for a in spec])
    return P()


def tp_specs(params, axis: str = "tp"):
    """PartitionSpec pytree matching `params` (HuBERT torch-layout names)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, _: tp_spec(_path_str(path), axis), params)


def check_tp(cfg, mesh: Mesh, axis: str = "tp") -> None:
    """The head reshape is the sharding unit: heads and the MLP hidden dim
    must divide by the tp axis size."""
    tp = dict(zip(mesh.axis_names, mesh.devices.shape))[axis]
    assert cfg.num_attention_heads % tp == 0, (
        f"num_attention_heads={cfg.num_attention_heads} not divisible by "
        f"tp={tp}")
    assert cfg.intermediate_size % tp == 0, (
        f"intermediate_size={cfg.intermediate_size} not divisible by tp={tp}")


def shard_params(mesh: Mesh, params, axis: str = "tp"):
    """Place a params tree with the TP rules (everything else replicated
    over the whole mesh). Optimizer state built from these params inherits
    the placements through sharding propagation."""
    return jax.tree_util.tree_map_with_path(
        lambda path, x: jax.device_put(
            x, NamedSharding(mesh, tp_spec(_path_str(path), axis))), params)


__all__ = ["TP_RULES", "tp_spec", "tp_specs", "check_tp", "shard_params"]
