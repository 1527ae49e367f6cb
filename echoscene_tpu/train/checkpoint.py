"""Checkpoint save/restore via Orbax.

Contract parity with the reference (SGDiff.save/load_networks,
model/SGDiff.py:49-129): one checkpoint per epoch at
<exp>/checkpoint/model<epoch>, containing params (GCNs + both denoisers +
frozen VQ-VAE), optimizer state, batch stats, step counter and epoch.  Restore
rebuilds the lr schedule implicitly (it is a pure function of the step).
"""
from __future__ import annotations

import os
from typing import Any

import jax
import orbax.checkpoint as ocp

from ..models.sgdiff import TrainState


# one shared checkpointer so saves can run ASYNC with at most one in flight
_CKPTR = None


def _checkpointer() -> ocp.StandardCheckpointer:
    global _CKPTR
    if _CKPTR is None:
        _CKPTR = ocp.StandardCheckpointer()
    return _CKPTR


def save_checkpoint(path: str, state: TrainState, wait: bool = True) -> None:
    """wait=False returns right after the host snapshot (jax.device_get) and
    lets the Orbax write proceed in the background, so periodic epoch saves
    stop blocking the train loop.  A subsequent save (or restore) first waits
    for the in-flight one; the final/interrupt save must use wait=True."""
    path = os.path.abspath(path)
    ckptr = _checkpointer()
    ckptr.wait_until_finished()
    ckptr.save(path, jax.device_get(state), force=True)
    if wait:
        ckptr.wait_until_finished()


def wait_for_checkpoints() -> None:
    if _CKPTR is not None:
        _CKPTR.wait_until_finished()


def restore_checkpoint(path: str, template: TrainState) -> TrainState:
    wait_for_checkpoints()          # the path may still be being written
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, jax.device_get(template))
    restored = ckptr.restore(path, abstract)
    # Re-apply the template's shardings: Orbax restores default-device arrays,
    # but a zero1 template carries P('data')-sharded mu/nu the train step
    # expects — resuming without this would silently re-lay-out every step.
    def _put(r, t):
        if isinstance(t, jax.Array) and not t.sharding.is_fully_replicated:
            return jax.device_put(r, t.sharding)
        return r
    return jax.tree.map(_put, restored, template)


def restore_for_inference(path: str, template: TrainState) -> TrainState:
    """Restore params/batch_stats/step/epoch ONLY; opt_state keeps the
    template's value.

    Eval and serving never read optimizer state, and a checkpoint written by
    a `--zero1` run stores a sharded `Zero1State` whose tree structure does
    not match the replicated optax template (and whose padded mu/nu length
    depends on the dp_devices count it trained with) — a full-tree
    StandardCheckpointer restore would fail.  Restoring the model subtrees by
    name makes inference restores independent of how the run was optimized.
    """
    wait_for_checkpoints()
    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    host = jax.device_get(template)
    abstract = {k: jax.tree.map(ocp.utils.to_shape_dtype_struct,
                                getattr(host, k))
                for k in ("params", "batch_stats", "step", "epoch")}
    restored = ckptr.restore(
        path, args=ocp.args.PyTreeRestore(abstract, partial_restore=True))
    return template.replace(**restored)


def load_vqvae_params(path: str, template_params: Any) -> Any:
    """Load a scripts/train_vqvae.py checkpoint and return its params cast
    onto the joint model's ['vqvae'] subtree.

    Mirrors the reference's frozen-pretrained-VQ contract: the VQ-VAE is
    trained separately and loaded frozen at model construction
    (model/model_utils.py:7-32 load_vqvae).
    """
    import jax.numpy as jnp

    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    abstract = {"params": jax.tree.map(ocp.utils.to_shape_dtype_struct,
                                       jax.device_get(template_params))}
    restored = ckptr.restore(
        path, args=ocp.args.PyTreeRestore(abstract, partial_restore=True))
    return jax.tree.map(lambda t, p: jnp.asarray(p, t.dtype),
                        template_params, restored["params"])


def latest_epoch(exp_dir: str) -> int:
    ckdir = os.path.join(exp_dir, "checkpoint")
    best = -1
    if os.path.isdir(ckdir):
        for name in os.listdir(ckdir):
            if name.startswith("model"):
                try:
                    best = max(best, int(name[len("model"):]))
                except ValueError:
                    pass
    return best
