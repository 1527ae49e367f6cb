"""Data-parallel (and optional tensor-parallel) training step.

Strategy (new design; the reference has no working distributed path —
SURVEY.md §2.5):
  * each device owns an independent flat graph batch (scenes are whole-shard
    local, so the echo GCN's gathers/scatters never cross devices),
  * the train step runs under `jax.shard_map` over a ('data',) mesh: loss and
    grads are `pmean`-ed over 'data', the optimizer update is computed
    redundantly on every device (replicated params in, replicated params out),
  * batch-stats updates are `pmean`-ed as well,
  * optional tensor parallelism: `shard_params_for_model_parallel` places the
    shape-UNet attention/FF kernels on a 'model' axis; XLA/GSPMD inserts the
    collectives.
"""
from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.sgdiff import SGDiff, TrainState, clip_and_sanitize_grads


def build_dp_train_step(sgdiff: SGDiff, mesh: Mesh, axis: str = "data",
                        donate: bool = False) -> Callable:
    """Returns step(state, stacked_batch, rngs) -> (state, metrics).

    stacked_batch: a SceneBatch pytree whose arrays have a leading device
    axis of size mesh.shape[axis] (see parallel.mesh.stack_shards).
    rngs: (n_devices, 2) uint32 PRNG keys, one per shard.
    """
    tx = None

    def local_step(state: TrainState, batch, rng):
        # shard_map hands us a leading axis of size 1 — drop it
        batch = jax.tree.map(lambda x: x[0], batch)
        rng = rng[0]
        (loss, (new_bs, metrics)), grads = jax.value_and_grad(
            sgdiff.loss_fn, has_aux=True)(state.params, state.batch_stats,
                                          batch, rng)
        grads = jax.lax.pmean(grads, axis)
        new_bs = jax.lax.pmean(new_bs, axis)
        metrics = jax.lax.pmean(metrics, axis)
        metrics["loss"] = jax.lax.pmean(loss, axis)
        grads = clip_and_sanitize_grads(grads)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=new_params,
                                  batch_stats=new_bs, opt_state=new_opt)
        return new_state, metrics

    def make(state: TrainState):
        nonlocal tx
        tx = sgdiff.ensure_tx(state.params)
        mapped = jax.shard_map(
            local_step, mesh=mesh,
            in_specs=(P(), P(axis), P(axis)),
            out_specs=(P(), P()),
            check_vma=False)
        return jax.jit(mapped, donate_argnums=(0,) if donate else ())

    return make


def build_dp_sample(sgdiff: SGDiff, mesh: Mesh, axis: str = "data",
                    gen_shape: bool = True,
                    with_manipulation: bool = False) -> Callable:
    """Data-parallel scene generation: sampling is embarrassingly parallel
    over scenes, so each device runs the full layout+shape chains on its own
    graph shard (params replicated, batches/rngs sharded on `axis`).

    Returns sample(params, batch_stats, stacked_batch, rngs) -> outputs whose
    arrays keep the leading device axis (n_devices, ...).
    """
    def local_sample(params, batch_stats, batch, rng):
        batch = jax.tree.map(lambda x: x[0], batch)
        out = sgdiff.sample_fn(params, batch_stats, batch, rng[0],
                               gen_shape=gen_shape,
                               with_manipulation=with_manipulation)
        return jax.tree.map(lambda x: x[None], out)

    mapped = jax.shard_map(
        local_sample, mesh=mesh,
        in_specs=(P(), P(), P(axis), P(axis)),
        out_specs=P(axis),
        check_vma=False)
    return jax.jit(mapped)


def shard_params_for_model_parallel(params, mesh: Mesh,
                                    axis: str = "model"):
    """Place large shape-UNet kernels on the 'model' axis (tensor parallel).

    Dense kernels (in, out) shard on out; attention out-proj shards on in —
    the standard Megatron column/row split, expressed purely as GSPMD
    shardings.  Everything else is replicated.
    """
    def spec_for(path) -> P:
        keys = [getattr(k, "key", "") for k in path]
        in_shape_unet = any(k == "shape_denoiser" for k in keys)
        if not in_shape_unet:
            return P()
        name = keys[-1]
        parent = keys[-2] if len(keys) > 1 else ""
        if name != "kernel":
            return P()
        if parent in ("to_q", "to_k", "to_v"):
            return P(None, axis)       # column parallel
        if parent == "to_out":
            return P(axis, None)       # row parallel
        return P()

    return jax.tree_util.tree_map_with_path(
        lambda path, x: jax.device_put(
            x, NamedSharding(mesh, spec_for(path))), params)
