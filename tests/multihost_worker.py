"""Worker for the multi-host smoke test (tests/test_multihost.py).

Builds a tiny EA training step deterministically (seed-fixed) so N processes
× M local devices and one process × N*M devices compute the SAME step — the
JAX-native analogue of the reference's mp.spawn DDP equivalence
(I_ea/hifi_gan/train.py:296-299): same global batch, same replicated params,
gradient all-reduce from GSPMD instead of NCCL.

Run as a script it is ONE process of a jax.distributed group:
    XLA_FLAGS=--xla_force_host_platform_device_count=4 \
      python multihost_worker.py --coordinator localhost:PORT \
        --num-processes 2 --process-id I --out OUT.npz
"""
import argparse
import sys

import numpy as np

B_GLOBAL = 8
T = 3200


def build_step():
    """(step_fn, state, full_batch): the tiny EA step from the driver dryrun,
    seed-deterministic on every process."""
    import jax
    import jax.numpy as jnp
    from speech_inpainting_tpu.models.hubert import EncoderWithHead, \
        HubertConfig
    from speech_inpainting_tpu.train.ea import (EAConfig, create_state,
                                                make_train_step)

    hcfg = HubertConfig(conv_dim=(32,) * 7, hidden_size=64,
                        num_hidden_layers=2, num_attention_heads=2,
                        intermediate_size=128, num_conv_pos_embeddings=15,
                        num_conv_pos_embedding_groups=1)
    cfg = EAConfig(mask_length=4)
    model = EncoderWithHead(hcfg, out_dim=80)
    rng = np.random.default_rng(0)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, T)))["params"]
    state = create_state(cfg, params)
    centroids = rng.standard_normal((100, 80)).astype(np.float32)
    step = make_train_step(model, cfg, centroids)
    n_frames = int(hcfg.feature_lengths(np.array([T]))[0])
    batch = {
        "wav": rng.standard_normal((B_GLOBAL, T)).astype(np.float32),
        "attn_mask": np.ones((B_GLOBAL, T), np.int32),
        "mask_pos": rng.integers(0, n_frames - cfg.mask_length,
                                 B_GLOBAL).astype(np.int32),
        "labels": rng.integers(0, 100,
                               (B_GLOBAL, cfg.mask_length)).astype(np.int32),
    }
    return step, state, batch


def run_step(mesh, step, state, local_batch, *, batch_spec=None):
    """One jitted step over `mesh`: state replicated, batch dim 0 sharded
    over every mesh axis. Each process passes its LOCAL batch rows."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P
    from speech_inpainting_tpu.parallel.distributed import shard_host_batch

    spec = batch_spec if batch_spec is not None else P(tuple(mesh.axis_names))
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, spec)
    state = shard_host_batch(mesh, state, P())
    batch = shard_host_batch(mesh, local_batch, spec)
    jstep = jax.jit(step, in_shardings=(repl, data),
                    out_shardings=(repl, repl))
    new_state, metrics = jstep(state, batch)
    jax.block_until_ready(metrics["loss"])
    return new_state, metrics


def summarize(new_state, metrics):
    """Scalars every process can compare: loss + per-leaf param means."""
    import jax
    out = {"loss": float(metrics["loss"])}
    leaves = jax.tree_util.tree_leaves_with_path(new_state.params)
    for path, leaf in leaves[:8]:
        out["p:" + jax.tree_util.keystr(path)] = float(
            np.mean(np.abs(np.asarray(leaf))))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--hybrid", action="store_true",
                    help="use the ('dcn','ici') hybrid mesh")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    from speech_inpainting_tpu.parallel.distributed import (
        initialize, is_coordinator, make_global_mesh, make_hybrid_mesh,
        sync_from_coordinator)
    assert initialize(args.coordinator, args.num_processes, args.process_id)
    assert jax.devices()[0].platform == "cpu", jax.devices()
    assert jax.process_count() == args.num_processes

    step, state, batch = build_step()
    # deliberately desync non-coordinator ranks, then rank-0-broadcast (the
    # post-restore path run.py uses): the downstream equivalence assertion
    # vs the single-process reference then also validates the sync — a
    # broken broadcast would leave rank 1 perturbed and change the result
    if not is_coordinator():
        state = state.replace(params=jax.tree_util.tree_map(
            lambda x: x + 1.0, state.params))
    state = sync_from_coordinator(state)
    per = B_GLOBAL // args.num_processes
    lo = args.process_id * per
    local = {k: v[lo:lo + per] for k, v in batch.items()}
    if args.hybrid:
        mesh = make_hybrid_mesh()        # ('dcn', 'ici')
    else:
        mesh = make_global_mesh()        # ('dp',)
    new_state, metrics = run_step(mesh, step, state, local)
    out = summarize(new_state, metrics)
    out["is_coordinator"] = float(is_coordinator())
    np.savez(args.out, **out)
    print(f"proc {args.process_id}: loss={out['loss']:.6f}", flush=True)


if __name__ == "__main__":
    sys.exit(main())
