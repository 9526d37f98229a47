"""Checkpoint save/restore (orbax) with the reference's layout semantics.

Reference behavior matched (SURVEY.md §5.4 — code new):
  - trainer pairs g_{step:08d} (generator) and do_{step:08d}
    (discriminators + optimizers + steps/epoch), I_ea/hifi_gan/train.py:194-206,
    I_da/scripts/train.py:317-331
  - `scan_checkpoint(dir, prefix)` → newest checkpoint or None
    (I_ea/hifi_gan/train.py:62-80 / I_da/src/utils.py)
  - partial restore: generator-only or discriminator-only warm starts
    (train_modified.py:72-93 UNIVERSAL_V1 flow)
Improvements over the reference: async orbax saves (training never blocks on
serialization) and atomic checkpoint directories — the preemption-safe
resume the reference lacks (SURVEY.md §5.3).
"""
from __future__ import annotations

import os
import re
from pathlib import Path
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def scan_checkpoint(directory, prefix: str) -> Optional[str]:
    """Newest '{prefix}{step:08d}' entry under `directory`, or None."""
    d = Path(directory)
    if not d.is_dir():
        return None
    pat = re.compile(re.escape(prefix) + r"(\d{8})$")
    best = None
    for p in d.iterdir():
        m = pat.match(p.name)
        if m:
            step = int(m.group(1))
            if best is None or step > best[0]:
                best = (step, str(p))
    return best[1] if best else None


def checkpoint_step(path) -> int:
    m = re.search(r"(\d{8})$", str(path))
    return int(m.group(1)) if m else 0


class Checkpointer:
    """Async g_/do_-style checkpointing for any pytree train state."""

    def __init__(self, directory):
        self.dir = Path(directory)
        self.dir.mkdir(parents=True, exist_ok=True)
        self._ckpt = ocp.StandardCheckpointer()

    def save(self, prefix: str, step: int, tree: Any, *, wait: bool = False):
        path = self.dir / f"{prefix}{step:08d}"
        tree = jax.tree_util.tree_map(np.asarray, tree)
        self._ckpt.save(path.absolute(), tree, force=True)
        if wait:
            self._ckpt.wait_until_finished()
        return str(path)

    def restore(self, prefix_or_path, template: Any, *, step: Optional[int]
                = None) -> Optional[Any]:
        """Restore the newest (or exact-step) checkpoint into `template`'s
        structure; None when nothing exists."""
        if os.path.isdir(str(prefix_or_path)) and re.search(
                r"\d{8}$", str(prefix_or_path)):
            path = str(prefix_or_path)
        elif step is not None:
            path = str(self.dir / f"{prefix_or_path}{step:08d}")
        else:
            path = scan_checkpoint(self.dir, str(prefix_or_path))
        if path is None or not os.path.isdir(path):
            return None
        self._ckpt.wait_until_finished()
        template = jax.tree_util.tree_map(np.asarray, template)
        return self._ckpt.restore(Path(path).absolute(), template)

    def wait(self):
        self._ckpt.wait_until_finished()


def save_gan_checkpoint(ckpt: Checkpointer, state, step: int,
                        *, wait: bool = False):
    """The reference's paired layout: g_* holds the generator, do_* holds
    discriminators + both optimizer states + counters. The generator's
    mutable VQ codebooks (joint enc-VQ-dec regime) ride in g_* — the
    reference stores `k` as a module buffer inside the generator state dict
    (vq.py:22) — and the restart rng in do_*."""
    g_tree = {"generator": state.g_params}
    if state.vq is not None:
        g_tree["vq"] = state.vq
    ckpt.save("g_", step, g_tree, wait=wait)
    do_tree = {
        "mpd": state.d_params["mpd"], "msd": state.d_params["msd"],
        "spectral": state.spectral, "optim_g": state.g_opt,
        "optim_d": state.d_opt, "steps": np.asarray(state.step),
    }
    if state.rng is not None:
        do_tree["rng"] = state.rng
    ckpt.save("do_", step, do_tree, wait=wait)


def restore_gan_checkpoint(ckpt: Checkpointer, state):
    """Resume a GAN train state; supports the reference's partial restores
    (generator-only g_* present, or discriminator-only do_*)."""
    g_tmpl = {"generator": state.g_params}
    if state.vq is not None:
        g_tmpl["vq"] = state.vq
    g = ckpt.restore("g_", g_tmpl)
    if g is not None:
        state = state.replace(g_params=g["generator"],
                              vq=g.get("vq", state.vq))
    do_tmpl = {
        "mpd": state.d_params["mpd"], "msd": state.d_params["msd"],
        "spectral": state.spectral, "optim_g": state.g_opt,
        "optim_d": state.d_opt, "steps": np.asarray(state.step)}
    if state.rng is not None:
        do_tmpl["rng"] = state.rng
    do = ckpt.restore("do_", do_tmpl)
    if do is not None:
        state = state.replace(
            d_params={"mpd": do["mpd"], "msd": do["msd"]},
            spectral=do["spectral"], g_opt=do["optim_g"],
            d_opt=do["optim_d"],
            step=jax.numpy.asarray(do["steps"]),
            rng=do.get("rng", state.rng))
    return state, g is not None, do is not None
