"""ZeRO-1 optimizer-state sharding over the data axis.

The replicated dp step (`parallel.dp.build_dp_train_step`) keeps a full AdamW
first+second moment pair on EVERY device — 2 extra f32 copies of the params.
On a 16 GB v5e chip that is the binding constraint: the single-chip flagship
already must donate its state to fit one AdamW copy (BASELINE.md).  This
module shards the moments across the 'data' mesh axis instead (ZeRO stage 1,
Rajbhandari et al. 2020), the TPU-idiomatic way:

  * grads are `psum_scatter`-ed (reduce-scatter over ICI) so each device only
    ever materialises its 1/N slice of the flat gradient,
  * each device owns the AdamW moments and the optimizer update for its slice,
  * updated param slices are `all_gather`-ed back to replicated params.

reduce_scatter + all_gather move the same bytes as the dp step's single
all-reduce (`pmean`), so the comm cost is unchanged while per-device optimizer
memory drops from 2·P to 2·P/N floats.  At flagship dims (634.9M params:
shape UNet 430.2M + layout UNet 163.7M + GCNs/VQ) the replicated moments are
5.08 GB f32 per device; on an 8-device dp mesh zero1 cuts that to 0.64 GB —
~4.4 GB of freed HBM per 16 GB chip that converts directly into larger
per-device `diffusion_bs`.

The flat-space update REPLICATES `models.sgdiff.make_optimizer` semantics
exactly (verified by `tests/test_zero1.py` equivalence tests):
  * shape-denoiser subtree grad-norm clip at 5 then NaN→0 sanitize
    (clip_and_sanitize_grads; reference train_3dfront.py:253-259),
  * AdamW at optax defaults (b1=.9, b2=.999, eps=1e-8, weight_decay=1e-4)
    with the reference's piecewise-constant lr schedule,
  * the frozen VQ-VAE subtree receives no update and no decayed weights
    (multi_transform 'frozen' label → set_to_zero).

Gradient accumulation composes with the sharded moments (the 16 GB-chip
real-data configuration: effective batch 64 via `--grad_accum` PLUS sharded
AdamW state): each microbatch's flat gradient is reduce-scattered immediately
and accumulated in the SHARDED `acc` buffer (psum_scatter is linear, so
scattering each microbatch and summing shards equals scattering the sum) —
the accumulator costs P/N floats per device, never a full flat grad.  The
optimizer update fires every `grad_accum` calls on the accumulated MEAN,
matching optax.MultiSteps semantics on the replicated path
(tests/test_zero1.py::test_zero1_grad_accum_matches_dp_multisteps).

Scope: composes with plain dp ('data' axis, params replicated).  Not wired
for dp×tp zero (tp params are channel-sharded, which would interleave with
the flat partition) — `build_zero1_train_step` raises on a mesh with a
'model' axis > 1.
"""
from __future__ import annotations

from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct
from jax.flatten_util import ravel_pytree
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.sgdiff import SGDiff, TrainState, lr_schedule

# AdamW hyperparameters — MUST match optax.adamw's defaults as used in
# models.sgdiff.make_optimizer (tests/test_zero1.py asserts step-for-step
# numerical agreement with the optax chain, so drift is caught).
_B1, _B2, _EPS, _WD = 0.9, 0.999, 1e-8, 1e-4
_CLIP_NORM = 5.0


class Zero1State(struct.PyTreeNode):
    """Flat sharded AdamW state: `mu`/`nu` are (P_pad,) f32 arrays carried
    with NamedSharding P('data') — each device holds one 1/N slice.

    `acc`/`mini_step` implement flat-space gradient accumulation (MultiSteps
    semantics): `acc` holds the sharded SUM of the microbatch grad shards
    (shrunk to one element per device when grad_accum == 1 — Orbax cannot
    save zero-size arrays), `mini_step` counts microbatches within the
    current optimizer step."""
    count: jnp.ndarray   # int32 scalar, replicated (optax count semantics)
    mu: jnp.ndarray
    nu: jnp.ndarray
    acc: jnp.ndarray
    mini_step: jnp.ndarray


def _flat_masks(params) -> Tuple[np.ndarray, np.ndarray, int]:
    """Boolean masks over the ravel_pytree flattening of `params`:
    (trainable, shape-denoiser-clip-subtree, total length).

    ravel_pytree concatenates tree_flatten-ordered leaves, so building the
    masks from tree_flatten_with_path on the SAME tree lines up exactly.
    """
    leaves = jax.tree_util.tree_flatten_with_path(params)[0]
    train_parts, clip_parts = [], []
    for path, leaf in leaves:
        keys = [getattr(k, "key", "") for k in path]
        n = int(np.prod(leaf.shape)) if leaf.shape else 1
        train_parts.append(np.full(n, "vqvae" not in keys, np.bool_))
        clip_parts.append(np.full(n, "shape_denoiser" in keys, np.bool_))
    train = np.concatenate(train_parts) if train_parts else np.zeros(0, bool)
    clip = np.concatenate(clip_parts) if clip_parts else np.zeros(0, bool)
    return train, clip, int(train.size)


def init_zero1_state(state: TrainState, mesh: Mesh, axis: str = "data",
                     grad_accum: int = 1) -> TrainState:
    """Replace `state.opt_state` with a fresh sharded Zero1State (zeros).

    With grad_accum > 1 the state carries a sharded accumulator of the same
    padded length as the moments; with grad_accum == 1 it is empty so the
    common case pays no extra HBM."""
    _, _, n = _flat_masks(state.params)
    n_dev = mesh.shape[axis]
    n_pad = -(-n // n_dev) * n_dev
    sharding = NamedSharding(mesh, P(axis))
    zeros = jax.jit(lambda: jnp.zeros((n_pad,), jnp.float32),
                    out_shardings=sharding)
    # idle accumulator is n_dev elements (1/device): zero-size arrays can't
    # ride through Orbax saves, and a full n_pad buffer would waste P/N
    # floats per device in the common accum==1 case
    acc_len = n_pad if int(grad_accum) > 1 else n_dev
    acc = jax.jit(lambda: jnp.zeros((acc_len,), jnp.float32),
                  out_shardings=sharding)()
    opt = Zero1State(count=jnp.zeros((), jnp.int32), mu=zeros(), nu=zeros(),
                     acc=acc, mini_step=jnp.zeros((), jnp.int32))
    return state.replace(opt_state=opt)


def zero1_update_shard(g_shard, p_shard, mu, nu, count, train_mask,
                       clip_mask, lr_fn: Callable, axis: str):
    """One flat-space AdamW update on this device's slice.

    g_shard is the already reduce-scattered MEAN gradient slice.  Exposed
    standalone so the fast toy-scale equivalence test can exercise it without
    building a model.
    """
    # shape-denoiser subtree clip at norm 5, THEN NaN->0 — mirroring
    # clip_and_sanitize_grads ordering (a NaN inside the subtree poisons the
    # norm and zeroes the whole subtree, identically in both paths)
    local_sq = jnp.sum(jnp.where(clip_mask, g_shard, 0.0) ** 2)
    norm = jnp.sqrt(jax.lax.psum(local_sq, axis))
    scale = jnp.minimum(1.0, _CLIP_NORM / jnp.maximum(norm, 1e-6))
    g = jnp.where(clip_mask, g_shard * scale, g_shard)
    g = jnp.nan_to_num(g, nan=0.0)
    # frozen entries never touch the moments (multi_transform set_to_zero
    # keeps no adam state for them)
    g = jnp.where(train_mask, g, 0.0)

    t = count + 1                       # optax scale_by_adam count_inc
    mu = _B1 * mu + (1.0 - _B1) * g
    nu = _B2 * nu + (1.0 - _B2) * g * g
    mu_hat = mu / (1.0 - _B1 ** t.astype(jnp.float32))
    nu_hat = nu / (1.0 - _B2 ** t.astype(jnp.float32))
    upd = mu_hat / (jnp.sqrt(nu_hat) + _EPS)
    upd = upd + _WD * p_shard           # add_decayed_weights
    lr = lr_fn(count)                   # scale_by_schedule reads PRE-inc count
    upd = jnp.where(train_mask, -lr * upd, 0.0)
    return p_shard + upd, mu, nu, t


def build_zero1_train_step(sgdiff: SGDiff, mesh: Mesh, axis: str = "data",
                           donate: bool = False) -> Callable:
    """Returns make(state) -> step(state, stacked_batch, rngs).

    `state.opt_state` must be a Zero1State (see init_zero1_state); params
    and batch_stats stay replicated exactly as in the dp step, and the
    stacked batch/rngs contract is identical to build_dp_train_step.
    """
    if mesh.shape.get("model", 1) > 1:
        raise ValueError("zero1 path does not compose with tensor "
                         "parallelism (channel-sharded params interleave "
                         "with the flat partition); use build_dp_train_step")
    accum = int(getattr(sgdiff.cfg, "grad_accum", 1) or 1)
    lr_fn = lr_schedule(sgdiff.cfg)
    n_dev = mesh.shape[axis]

    def make(state: TrainState):
        if not isinstance(state.opt_state, Zero1State):
            raise ValueError("state.opt_state is not a Zero1State; call "
                             "init_zero1_state(state, mesh) first")
        if accum > 1 and int(state.opt_state.acc.size) < n_dev * 2:
            raise ValueError(
                "grad_accum > 1 but the Zero1State has only an idle "
                "accumulator; call init_zero1_state(state, mesh, "
                "grad_accum=accum)")
        train_mask, clip_mask, n = _flat_masks(state.params)
        n_pad = -(-n // n_dev) * n_dev
        pad = n_pad - n
        tmask = jnp.asarray(np.pad(train_mask, (0, pad)))
        cmask = jnp.asarray(np.pad(clip_mask, (0, pad)))

        def local_step(state: TrainState, batch, rng, tmask, cmask):
            batch = jax.tree.map(lambda x: x[0], batch)
            rng = rng[0]
            (loss, (new_bs, metrics)), grads = jax.value_and_grad(
                sgdiff.loss_fn, has_aux=True)(state.params, state.batch_stats,
                                              batch, rng)
            new_bs = jax.lax.pmean(new_bs, axis)
            metrics = jax.lax.pmean(metrics, axis)
            metrics["loss"] = jax.lax.pmean(loss, axis)

            flat_g, _ = ravel_pytree(grads)
            flat_g = jnp.pad(flat_g.astype(jnp.float32), (0, pad))
            # reduce-scatter: each device receives the SUM of its slice
            g_shard = jax.lax.psum_scatter(flat_g, axis, scatter_dimension=0,
                                           tiled=True) / n_dev

            flat_p, unravel = ravel_pytree(state.params)
            flat_p = jnp.pad(flat_p, (0, pad))
            idx = jax.lax.axis_index(axis)
            chunk = n_pad // n_dev
            p_shard = jax.lax.dynamic_slice(flat_p, (idx * chunk,), (chunk,))

            opt = state.opt_state
            if accum == 1:
                new_p_shard, mu, nu, t = zero1_update_shard(
                    g_shard, p_shard, opt.mu, opt.nu, opt.count,
                    tmask, cmask, lr_fn, axis)
                new_opt = Zero1State(count=t, mu=mu, nu=nu, acc=opt.acc,
                                     mini_step=opt.mini_step)
            else:
                # MultiSteps semantics on the sharded slice: accumulate the
                # reduce-scattered microbatch grads, update on the MEAN every
                # `accum` calls.  The update is computed unconditionally and
                # selected — its elementwise cost is negligible vs fwd+bwd.
                g_sum = opt.acc + g_shard
                is_final = (opt.mini_step + 1) >= accum
                upd_p, mu, nu, t = zero1_update_shard(
                    g_sum / accum, p_shard, opt.mu, opt.nu, opt.count,
                    tmask, cmask, lr_fn, axis)
                sel = lambda a, b: jnp.where(is_final, a, b)
                new_p_shard = sel(upd_p, p_shard)
                new_opt = Zero1State(
                    count=sel(t, opt.count), mu=sel(mu, opt.mu),
                    nu=sel(nu, opt.nu), acc=sel(jnp.zeros_like(g_sum), g_sum),
                    mini_step=sel(jnp.zeros((), jnp.int32),
                                  opt.mini_step + 1))

            new_flat = jax.lax.all_gather(new_p_shard, axis, axis=0,
                                          tiled=True)
            new_params = unravel(new_flat[:n])
            new_state = state.replace(
                step=state.step + 1, params=new_params, batch_stats=new_bs,
                opt_state=new_opt)
            return new_state, metrics

        state_spec = TrainState(
            step=P(), params=P(), batch_stats=P(),
            opt_state=Zero1State(count=P(), mu=P(axis), nu=P(axis),
                                 acc=P(axis), mini_step=P()),
            epoch=P())
        mapped = jax.shard_map(
            local_step, mesh=mesh,
            in_specs=(state_spec, P(axis), P(axis), P(axis), P(axis)),
            out_specs=(state_spec, P()),
            check_vma=False)
        jitted = jax.jit(mapped, donate_argnums=(0,) if donate else ())
        return lambda state, stacked, rngs: jitted(state, stacked, rngs,
                                                   tmask, cmask)

    return make
