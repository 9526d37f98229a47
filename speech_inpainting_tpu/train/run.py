"""Training loop runners: epochs × batches around the jitted steps, with
logging, validation, and checkpoint/resume.

These mirror the reference's loop scaffolding (I_ea/main.py:144-273,
I_ea/hifi_gan/train.py:120-261, I_da/scripts/train.py:236-420 — code new):
periodic stdout/TB logging, interval validation, best-metric and paired
g_/do_ checkpointing, auto-resume from the newest checkpoint.
"""
from __future__ import annotations

import dataclasses
import inspect
import signal
import threading
from typing import Callable, Optional

import jax
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec

from ..data.pipeline import device_prefetch
from ..parallel.distributed import (is_coordinator, local_batches,
                                    shard_host_batch, sync_from_coordinator)
from ..utils.checkpoints import (Checkpointer, restore_gan_checkpoint,
                                 save_gan_checkpoint)
from ..utils.logging import TrainLogger


@dataclasses.dataclass
class RunConfig:
    epochs: int = 100
    checkpoint_dir: str = "checkpoints"
    log_dir: Optional[str] = None
    stdout_interval: int = 5
    summary_interval: int = 100
    checkpoint_interval: int = 5000
    validation_interval: int = 1000
    training_steps: Optional[int] = None   # hard step cap (I_da h.training_steps)
    mesh: Optional[object] = None          # jax Mesh for dp sharding
    abort_nonfinite: int = 0               # >0: abort (after checkpointing
                                           # the still-finite state) once the
                                           # step metric 'nonfinite_skips'
                                           # (train/guard.py consecutive-skip
                                           # counter) exceeds this at a
                                           # stdout_interval boundary


class PreemptionGuard:
    """SIGTERM/SIGINT → checkpoint-and-exit at the next step boundary.

    The reference has no preemption handling (SURVEY.md §5.3: recovery =
    restart + scan_checkpoint); on managed TPU pools preemption arrives as
    SIGTERM with a grace window, so the runners save the full train state
    and return cleanly instead of dying mid-step. Installs handlers only in
    the main thread (signal module constraint); elsewhere it is inert."""

    def __init__(self, signals=(signal.SIGTERM, signal.SIGINT)):
        self.requested = False
        self._signals = signals
        self._prev = {}

    def _on(self, signum, frame):
        self.requested = True

    def __enter__(self):
        if threading.current_thread() is threading.main_thread():
            for s in self._signals:
                self._prev[s] = signal.signal(s, self._on)
        return self

    def __exit__(self, *exc):
        for s, h in self._prev.items():
            signal.signal(s, h)
        return False


def _mesh_jit(step_fn: Callable, run: RunConfig):
    """jit the step with the run's SPMD layout: with a mesh, state and
    metrics are replicated (NamedSharding(mesh, P())) and batches arrive
    dp-sharded from device_prefetch — XLA inserts the gradient all-reduces
    (the DDP loop this replaces, I_ea/hifi_gan/train.py:44-106). Returns
    (jitted_step, place_state)."""
    if run.mesh is None:
        if jax.process_count() > 1:
            raise RuntimeError(
                "multi-process runtime with RunConfig.mesh=None: each "
                "process would silently train a divergent model (no "
                "gradient reduction). Build a global mesh "
                "(parallel.mesh.make_mesh / make_hybrid_mesh) and set "
                "RunConfig.mesh — the CLIs do this via --mesh.")
        return jax.jit(step_fn), lambda s: s
    from ..parallel.mesh import data_spec
    repl = NamedSharding(run.mesh, PartitionSpec())
    # P('dp') when the mesh has one; otherwise the batch dim shards over
    # every axis, which makes the ('dcn','ici') hybrid mesh trainable
    data = NamedSharding(run.mesh, data_spec(run.mesh))
    jstep = jax.jit(step_fn, in_shardings=(repl, data),
                    out_shardings=(repl, repl))
    # shard_host_batch handles the multi-process (non-addressable-device)
    # replication path; single-process it is a plain device_put
    return jstep, lambda s: shard_host_batch(run.mesh, s, PartitionSpec())


def _check_nonfinite_abort(run: RunConfig, steps: int, metrics,
                           save_fn: Callable):
    """Abort the run loudly when the guard's consecutive-skip counter
    (train/guard.py; surfaced as metrics['nonfinite_skips'] by steps built
    with skip_nonfinite>0) exceeds the budget. Checked only at
    stdout_interval boundaries — reading the scalar forces a device sync,
    which the logger already pays there. The guard itself NEVER applies a
    nonfinite update, so params are still clean: checkpoint them, then
    raise."""
    if not run.abort_nonfinite or steps % run.stdout_interval:
        return
    skips = metrics.get("nonfinite_skips")
    if skips is None or int(skips) <= run.abort_nonfinite:
        return
    save_fn()
    raise RuntimeError(
        f"aborting at step {steps}: {int(skips)} consecutive updates had "
        f"nonfinite grads (> budget {run.abort_nonfinite}); none were "
        "applied — the saved checkpoint is finite. Inspect the data/lr.")


def gan_valid_fn(eval_fn: Callable, val_batches, mesh=None,
                 params_fn: Callable = lambda s: s.g_params,
                 media_fwd: Optional[Callable] = None,
                 media_mel=None, sample_rate: Optional[int] = None):
    """Build run_gan_training's valid_fn from a make_gan_eval product: jits
    eval_fn(params_fn(state), batch), places each host batch on the training
    mesh (replicated — same constraint as run_ea_training's placement note:
    global params + host-local batches die mixing incompatible devices), and
    returns the per-metric means over `val_batches`.

    `media_fwd` (the generator_fwd the eval uses) enables the reference's
    validation TB media (I_ea/hifi_gan/train.py:228-246): each sweep logs
    the first validation item's synthesized audio (at `sample_rate`) and,
    with `media_mel` (a MelConfig), its mel figure."""
    jev = jax.jit(eval_fn)
    place = ((lambda b: shard_host_batch(mesh, b, PartitionSpec()))
             if mesh is not None else (lambda b: b))
    jfwd = jax.jit(media_fwd) if media_fwd is not None else None

    def valid_fn(state, logger=None, steps: int = 0):
        vals = [jev(params_fn(state), place(b)) for b in val_batches]
        if jfwd is not None and logger is not None and val_batches:
            out = jfwd(params_fn(state), place(val_batches[0]))
            y = out[0] if isinstance(out, tuple) else out
            wav = np.asarray(y[0, 0], np.float32)
            logger.audio("validation/audio", wav, steps,
                         sample_rate or 22050)
            if media_mel is not None:
                from ..ops.mel import mel_spectrogram
                logger.mel_figure(
                    "validation/mel",
                    np.asarray(mel_spectrogram(jax.numpy.asarray(wav)[None],
                                               media_mel))[0], steps)
        if not vals:
            return {}
        return {k: float(np.mean([float(v[k]) for v in vals]))
                for k in vals[0]}

    return valid_fn


def run_gan_training(step_fn: Callable, state, make_batches: Callable,
                     run: RunConfig, *, valid_fn: Optional[Callable] = None):
    """Drive a GAN train state: step_fn(state, batch), make_batches(epoch) →
    iterable of host batches. Returns the final state."""
    coord = is_coordinator()
    ckpt = Checkpointer(run.checkpoint_dir)
    state, had_g, had_do = restore_gan_checkpoint(ckpt, state)
    # rank-0 broadcast after restore: ranks whose checkpoint dir is stale or
    # unshared must not enter the loop with divergent "replicated" state
    state = sync_from_coordinator(state)
    if (had_g or had_do) and coord:
        print(f"resumed from step {int(state.step)}")
    logger = TrainLogger(run.log_dir, stdout_interval=run.stdout_interval,
                         summary_interval=run.summary_interval,
                         quiet=not coord)
    jstep, place = _mesh_jit(step_fn, run)
    state = place(state)
    steps = int(state.step)
    # gan_valid_fn accepts (state, logger=, steps=) for the reference's
    # validation TB media (train.py:228-246); plain valid_fn(state)
    # callables keep working — signature probed once
    rich_valid = valid_fn is not None and "logger" in inspect.signature(
        valid_fn).parameters
    with PreemptionGuard() as pre:
        for epoch in range(run.epochs):
            for batch in device_prefetch(local_batches(make_batches(epoch)),
                                         mesh=run.mesh):
                state, metrics = jstep(state, batch)
                steps += 1
                logger.step(steps, {k: v for k, v in metrics.items()
                                    if np.ndim(v) == 0})
                _check_nonfinite_abort(
                    run, steps, metrics,
                    lambda: coord and save_gan_checkpoint(
                        ckpt, state, steps, wait=True))
                if pre.requested:
                    if coord:
                        save_gan_checkpoint(ckpt, state, steps, wait=True)
                        print(f"preempted: saved g_/do_ at step {steps}")
                    logger.close()
                    return state
                if steps % run.checkpoint_interval == 0 and coord:
                    save_gan_checkpoint(ckpt, state, steps)
                if valid_fn is not None and \
                        steps % run.validation_interval == 0:
                    val = (valid_fn(state, logger=logger, steps=steps)
                           if rich_valid else valid_fn(state))
                    for k, v in val.items():
                        logger.scalar(f"validation/{k}", v, steps)
                if run.training_steps and steps >= run.training_steps:
                    break
            else:
                continue
            break
    if coord:
        save_gan_checkpoint(ckpt, state, steps, wait=True)
    logger.close()
    return state


def run_ea_training(step_fn: Callable, eval_fn: Callable, state,
                    make_batches: Callable, make_valid_batches: Callable,
                    run: RunConfig):
    """I_ea loop: validation sweep every `validation_interval` batches with
    best-cosine-accuracy model selection (main.py:209-265)."""
    coord = is_coordinator()
    ckpt = Checkpointer(run.checkpoint_dir)
    logger = TrainLogger(run.log_dir, stdout_interval=run.stdout_interval,
                         summary_interval=run.summary_interval,
                         quiet=not coord)
    jstep, place = _mesh_jit(step_fn, run)
    # full-state resume (params + optimizer + counter): the reference's I_ea
    # loop restarts from bare model weights only (main.py:259-273); ea_*
    # checkpoints make restart/preemption lossless
    full = ckpt.restore("ea_", state)
    if full is not None:
        state = full
        if coord:
            print(f"resumed from step {int(state.step)}")
    state = sync_from_coordinator(state)   # rank-0 broadcast (see GAN loop)
    state = place(state)
    best_acc = -np.inf
    steps = int(state.step)
    with PreemptionGuard() as pre:
        for epoch in range(run.epochs):
            for batch in device_prefetch(local_batches(make_batches(epoch)),
                                         mesh=run.mesh):
                state, metrics = jstep(state, batch)
                steps += 1
                logger.step(steps, {k: v for k, v in metrics.items()
                                    if np.ndim(v) == 0})
                _check_nonfinite_abort(
                    run, steps, metrics,
                    lambda: coord and ckpt.save("ea_", steps, state,
                                                wait=True))
                if pre.requested:
                    if coord:
                        ckpt.save("ea_", steps, state, wait=True)
                        print(f"preempted: saved ea_ at step {steps}")
                    logger.close()
                    return state
                if steps % run.checkpoint_interval == 0 and coord:
                    ckpt.save("ea_", steps, state)
                if steps % run.validation_interval == 0:
                    # with a mesh, params are global (possibly spanning
                    # non-addressable devices in multi-host) — the raw host
                    # batch must be placed on the SAME mesh (replicated;
                    # valid batches are tiny and identical on every
                    # process) or the jit dies mixing incompatible devices
                    vb_place = (
                        (lambda b: shard_host_batch(run.mesh, b,
                                                    PartitionSpec()))
                        if run.mesh is not None else (lambda b: b))
                    vals = [eval_fn(state.params, vb_place(vb))
                            for vb in make_valid_batches(epoch)]
                    if vals:
                        mean = {k: float(np.mean([float(v[k]) for v in vals]))
                                for k in vals[0]}
                        for k, v in mean.items():
                            logger.scalar(f"validation/{k}", v, steps)
                        if mean.get("cos_sim_acc", -np.inf) > best_acc:
                            best_acc = mean["cos_sim_acc"]
                            if coord:
                                ckpt.save("best_", 0,
                                          {"model": state.params})
                if run.training_steps and steps >= run.training_steps:
                    break
            else:
                if coord:
                    ckpt.save("last_", 0, {"model": state.params})
                continue
            break
    if coord:
        ckpt.save("ea_", steps, state)
        ckpt.save("last_", 0, {"model": state.params}, wait=True)
    logger.close()
    return state
