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

from ..models.sgdiff import SGDiff, TrainState


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
        # clip/NaN-sanitize run inside tx on the pmean-ed grad (make_optimizer)
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
                    with_manipulation: bool = False,
                    shape_rows: int = None) -> Callable:
    """Data-parallel scene generation: sampling is embarrassingly parallel
    over scenes, so each device runs the full layout+shape chains on its own
    graph shard (params replicated, batches/rngs sharded on `axis`).

    shape_rows: static compacted shape-chain row count (must cover the
    max real-node count over ALL shards — use shape_row_capacity per shard
    and take the max).

    Returns sample(params, batch_stats, stacked_batch, rngs) -> outputs whose
    arrays keep the leading device axis (n_devices, ...).
    """
    def local_sample(params, batch_stats, batch, rng):
        batch = jax.tree.map(lambda x: x[0], batch)
        out = sgdiff.sample_fn(params, batch_stats, batch, rng[0],
                               gen_shape=gen_shape,
                               with_manipulation=with_manipulation,
                               shape_rows=shape_rows)
        return jax.tree.map(lambda x: x[None], out)

    mapped = jax.shard_map(
        local_sample, mesh=mesh,
        in_specs=(P(), P(), P(axis), P(axis)),
        out_specs=P(axis),
        check_vma=False)
    return jax.jit(mapped)


def shard_params_for_model_parallel(params, mesh: Mesh,
                                    axis: str = "model"):
    """Place the shape-UNet's large kernels on the 'model' axis (tensor
    parallel), expressed purely as GSPMD parameter shardings — XLA's sharding
    propagation inserts the collectives.

    The model is conv-dominated (BASELINE.md: ~96% of generation time is
    UNet3D forwards), so the load-bearing split is the Megatron-style
    column/row pairing of each ResBlock's two 3x3x3 convs:

      * Conv_0 (first conv) shards on OUTPUT channels -> its activation is
        channel-sharded,
      * the time-embedding Dense_0 and GroupNorm32_1 affine params shard the
        same way (GroupNorm(32) group statistics stay shard-local because
        every reference channel count is a multiple of 32 x n_model),
      * Conv_1 (second, zero-init conv) shards on INPUT channels; XLA
        all-reduces its partial outputs (bias + skip stay replicated).

    Attention q/k/v kernels shard on heads (column), out-proj on input (row).
    Everything else is replicated.
    """
    n_model = mesh.shape[axis]

    def spec_for(path, x) -> P:
        keys = [getattr(k, "key", "") for k in path]
        if not any(k == "shape_denoiser" for k in keys):
            return P()
        name = keys[-1]
        parent = keys[-2] if len(keys) > 1 else ""
        gparent = keys[-3] if len(keys) > 2 else ""
        in_res = gparent.endswith("_res") or gparent.startswith("mid_res")
        if in_res and parent == "Conv_0":
            if name == "kernel":
                return P(None, None, None, None, axis)   # column parallel
            return P(axis)                               # bias
        if in_res and parent == "Dense_0":
            return P(None, axis) if name == "kernel" else P(axis)
        if in_res and parent == "GroupNorm32_1":
            # per-channel affine of the column-sharded activation; the group
            # stats stay shard-local iff each shard holds whole groups:
            # channels-per-shard (C/n) must be a multiple of the group size
            # (C/32), i.e. n_model divides 32 (and C)
            if 32 % n_model == 0 and x.shape[-1] % n_model == 0:
                return P(axis)
            return P()
        if in_res and parent == "Conv_1" and name == "kernel":
            return P(None, None, None, axis, None)       # row parallel
        if name != "kernel":
            return P()
        if parent in ("to_q", "to_k", "to_v"):
            return P(None, axis)       # column parallel
        if parent == "to_out":
            return P(axis, None)       # row parallel
        return P()

    def put(path, x):
        spec = spec_for(path, x)
        # never shard a dim the axis doesn't divide (tiny test configs)
        for dim, name in enumerate(spec):
            if name == axis and x.shape[dim] % n_model:
                spec = P()
                break
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(put, params)


def build_dp_tp_sample(sgdiff: SGDiff, mesh: Mesh, gen_shape: bool = True,
                       with_manipulation: bool = False,
                       shape_rows: int = None) -> Callable:
    """GSPMD dp x tp scene generation: the shard axis of a stacked batch is
    vmapped and sharded on 'data', while params carry 'model' shardings
    (shard_params_for_model_parallel) so every conv/attention matmul inside
    the denoising scans splits over the model axis.

    Callers device_put the stacked batch/rngs with P('data') leading-axis
    shardings (parallel.mesh.shard_stacked); params must already be committed
    to the mesh.  Returns outputs stacked on the leading device axis.
    """
    def one(params, batch_stats, batch, rng):
        return sgdiff.sample_fn(params, batch_stats, batch, rng,
                                gen_shape=gen_shape,
                                with_manipulation=with_manipulation,
                                shape_rows=shape_rows)

    return jax.jit(jax.vmap(one, in_axes=(None, None, 0, 0)))
