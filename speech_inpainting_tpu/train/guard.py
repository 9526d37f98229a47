"""Nonfinite-update guard: never apply a nan/inf gradient update.

`optax.apply_if_finite` is NOT this: after `max_consecutive_errors` ignored
updates it "gives up and accepts" — i.e. it applies the nan update and
silently destroys the run it was meant to protect. The wrapper here never
accepts: a nonfinite update is always skipped whole (params and inner
optimizer moments untouched) and a consecutive-skip counter is exposed so
the HOST training loop can abort loudly (checkpointing the still-finite
state first) once the streak exceeds the configured budget — raising is
impossible inside jit, so the abort has to live loop-side
(`train/run.py`, `RunConfig.abort_nonfinite`).

A production robustness feature the reference lacks: one bad batch nans a
torch run permanently (no finiteness checks anywhere in
I_ea/main.py / I_ea/hifi_gan/train.py / I_da/scripts/train.py).
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax


class SkipNonFiniteState(NamedTuple):
    notfinite_count: jnp.ndarray     # CONSECUTIVE skipped updates
    total_notfinite: jnp.ndarray     # lifetime skipped updates
    inner_state: Any


def all_finite(tree) -> jnp.ndarray:
    """Scalar bool: every leaf of `tree` is free of nan/inf."""
    leaves = jax.tree_util.tree_leaves(tree)
    if not leaves:
        return jnp.asarray(True)
    return jnp.all(jnp.stack([jnp.all(jnp.isfinite(l)) for l in leaves]))


def tree_if_finite(new, old):
    """`new` if every leaf of `new` is finite, else `old` — used to gate
    non-optimizer state that updates in-forward (e.g. EMA-VQ codebooks,
    quantize/vq.py) which an optimizer-level guard cannot see."""
    ok = all_finite(new)
    return jax.tree_util.tree_map(
        lambda n, o: jnp.where(ok, n, o), new, old)


def skip_if_nonfinite(
        inner: optax.GradientTransformation) -> optax.GradientTransformation:
    """Wrap `inner` so nonfinite gradient updates are skipped — always."""
    inner = optax.with_extra_args_support(inner)

    def init(params):
        return SkipNonFiniteState(
            notfinite_count=jnp.zeros([], jnp.int32),
            total_notfinite=jnp.zeros([], jnp.int32),
            inner_state=inner.init(params))

    def update(updates, state, params=None, **extra):
        ok = all_finite(updates)

        def do(_):
            return inner.update(updates, state.inner_state, params, **extra)

        def skip(_):
            return (jax.tree_util.tree_map(jnp.zeros_like, updates),
                    state.inner_state)

        new_updates, inner_state = jax.lax.cond(ok, do, skip, operand=None)
        return new_updates, SkipNonFiniteState(
            notfinite_count=jnp.where(ok, 0, state.notfinite_count + 1
                                      ).astype(jnp.int32),
            total_notfinite=(state.total_notfinite +
                             jnp.where(ok, 0, 1).astype(jnp.int32)),
            inner_state=inner_state)

    return optax.GradientTransformationExtraArgs(init=init, update=update)
