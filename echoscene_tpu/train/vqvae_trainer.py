"""Standalone VQ-VAE training harness.

The reference downloads a pretrained VQ-VAE (README.md:81) and its own
trainer is broken legacy (vqvae_model.py imports a nonexistent module —
SURVEY.md §2.1), so this harness is built fresh:
  * loss: L1 reconstruction + codebook-weighted commitment loss
    (VQLoss, model/losses.py:63-82; codebook_weight 1.0),
  * optimizer: Adam, StepLR-style decay (vqvae_model.py family),
  * eval metric: occupancy IoU at SDF threshold 0 between input and
    reconstruction (model/diff_utils/util.py:111-131), best-IoU checkpointing
    (vqvae_model.py:158-168).

The jitted step trains the VQVAE module standalone; its params slot directly
into the EchoScene joint model's 'vqvae' subtree.
"""
from __future__ import annotations

import functools
from typing import Any, Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from ..nn.vqvae import VQVAE
from ..models.config import VQVAEConfig


class VQTrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any


def voxel_iou(x_gt: jnp.ndarray, x_rec: jnp.ndarray,
              thres: float = 0.0) -> jnp.ndarray:
    """Occupied-space IoU per item; occupancy = sdf <= thres
    (diff_utils/util.py:111-131)."""
    gt = x_gt <= 0.0
    rec = x_rec <= thres
    axes = tuple(range(1, x_gt.ndim))
    inter = jnp.sum(jnp.logical_and(gt, rec), axis=axes)
    union = jnp.sum(jnp.logical_or(gt, rec), axis=axes)
    return inter / (union + 1e-12)


class VQVAETrainer:
    def __init__(self, cfg: VQVAEConfig, lr: float = 1e-4,
                 codebook_weight: float = 1.0,
                 compute_dtype: Optional[str] = None):
        self.cfg = cfg
        self.codebook_weight = codebook_weight
        self.model = VQVAE(
            n_embed=cfg.n_embed, embed_dim=cfg.embed_dim, ch=cfg.ch,
            ch_mult=tuple(cfg.ch_mult), num_res_blocks=cfg.num_res_blocks,
            attn_resolutions=tuple(cfg.attn_resolutions),
            in_channels=cfg.in_channels, out_ch=cfg.out_ch,
            z_channels=cfg.z_channels, resolution=cfg.resolution,
            dtype=jnp.bfloat16 if compute_dtype == "bfloat16" else None)
        self.tx = optax.adam(lr)
        self.best_iou = -1.0
        self._step = None
        self._eval = None

    def init(self, rng: jax.Array, sample: jnp.ndarray) -> VQTrainState:
        params = self.model.init(rng, sample)["params"]
        return VQTrainState(step=jnp.zeros((), jnp.int32), params=params,
                            opt_state=self.tx.init(params))

    def loss_fn(self, params, batch: jnp.ndarray):
        rec, codebook_loss = self.model.apply({"params": params}, batch)
        rec_loss = jnp.mean(jnp.abs(batch - rec))
        loss = rec_loss + self.codebook_weight * codebook_loss
        return loss, {"loss_total": loss, "loss_rec": rec_loss,
                      "loss_codebook": codebook_loss}

    def train_step(self, state: VQTrainState, batch: jnp.ndarray):
        if self._step is None:
            def step(state, batch):
                (loss, logs), grads = jax.value_and_grad(
                    self.loss_fn, has_aux=True)(state.params, batch)
                updates, opt_state = self.tx.update(grads, state.opt_state,
                                                    state.params)
                params = optax.apply_updates(state.params, updates)
                return state.replace(step=state.step + 1, params=params,
                                     opt_state=opt_state), logs
            self._step = jax.jit(step)
        return self._step(state, batch)

    def eval_iou(self, state: VQTrainState, batches: Iterable[jnp.ndarray],
                 thres: float = 0.0) -> Tuple[float, float]:
        """Mean/std reconstruction IoU over an eval set (vqvae_model.py:138-156)."""
        if self._eval is None:
            def ev(params, batch):
                rec, _ = self.model.apply({"params": params}, batch)
                return voxel_iou(batch, rec, thres)
            self._eval = jax.jit(ev)
        ious = [np.asarray(self._eval(state.params, b)) for b in batches]
        allv = np.concatenate(ious)
        return float(allv.mean()), float(allv.std())

    def encode(self, state: VQTrainState, sdf: jnp.ndarray) -> jnp.ndarray:
        return self.model.apply({"params": state.params}, sdf,
                                forward_no_quant=True, encode_only=True)
