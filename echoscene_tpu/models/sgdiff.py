"""SGDiff facade: builds the model, optimizer, jitted train step and samplers.

API reference: /root/reference/model/SGDiff.py (facade with forward_mani,
sample_box_and_shape, sample_boxes_and_shape_with_changes/_additions,
load_networks, save) and the optimizer/schedule wiring in
EchoScene.optimizer_ini / lr_lambda (EchoScene.py:117-141: joint AdamW lr 1e-4
over GCN+layout+shape params, piecewise lr 1e-4 -> 5e-5 / 1e-5 / 5e-6 at the
configured counters; the frozen VQ-VAE is excluded).

Everything heavy is one jitted function:
  * train_step: both branches' losses + grads + shape-branch grad clipping at
    norm 5 + NaN-grad zeroing (train_3dfront.py:249-261) + AdamW update,
  * sample: layout DDPM full chain and shape DDIM chain as lax.scans whose
    bodies contain the echo GCN — zero host round-trips per step.
"""
from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from flax.core import FrozenDict

from ..core import schedules as S
from ..core.boxes import box_vec_from_boxes
from ..core.graphbatch import SceneBatch
from ..diffusion.ddpm import LayoutDiffusion, masked_mean
from ..diffusion.ldm import ShapeDiffusion
from .config import EchoSceneConfig
from .echo_scene import EchoSceneModule


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    epoch: jnp.ndarray


def lr_schedule(cfg: EchoSceneConfig):
    """Piecewise-constant lr (EchoScene.lr_lambda :117-128)."""
    lrs = [cfg.lr_init] + list(cfg.lr_evo)
    scales = {int(b): lrs[i + 1] / lrs[i] for i, b in enumerate(cfg.lr_step)}
    return optax.piecewise_constant_schedule(cfg.lr_init, scales)


def _label_params(params) -> Any:
    flat = jax.tree_util.tree_map_with_path(
        lambda path, _: "frozen" if any(
            getattr(k, "key", None) == "vqvae" for k in path) else "train",
        params)
    return flat


def make_optimizer(cfg: EchoSceneConfig, params):
    # clip/NaN-sanitize live INSIDE the chain (before adamw) so that under
    # MultiSteps they run on the ACCUMULATED mean grad — matching the
    # reference's once-per-optimizer-step clip of the full effective-batch
    # grad (train_3dfront.py:253-259) rather than clipping each microbatch.
    tx = optax.chain(
        clip_and_sanitize_transform(),
        optax.multi_transform(
            {"train": optax.adamw(lr_schedule(cfg)),
             "frozen": optax.set_to_zero()},
            _label_params(params)))
    accum = int(getattr(cfg, "grad_accum", 1) or 1)
    if accum > 1:
        # Gradient accumulation: each train_step call feeds one microbatch;
        # the inner tx (and so the lr schedule's step count — the reference's
        # per-optimizer-step LambdaLR semantics, EchoScene.py:117-128) only
        # advances every `accum` calls, applying the MEAN of the accumulated
        # grads.  Approximates the reference's effective batch 64 on one chip
        # (equal-weight mean over microbatches; the reference's single mean
        # over all valid objects weights scenes by object count, so the two
        # differ when object counts vary across microbatches).
        tx = optax.MultiSteps(tx, every_k_schedule=accum)
    return tx


def shape_row_capacity(batch: SceneBatch, multiple: int = 4) -> int:
    """Host-side STATIC row count for the compacted sampling shape chain.

    Real nodes occupy the scene-major prefix; the count is rounded up to
    `multiple` so the number of distinct compiled sampler variants stays
    bounded (and the chunked VQ decode stays divisible).
    """
    real = int(np.asarray(jax.device_get(batch.dec.obj_mask)).sum())
    rounded = -(-max(real, 1) // multiple) * multiple
    return min(batch.num_nodes, rounded)


def clip_and_sanitize_grads(grads, max_norm: float = 5.0):
    """clip_grad_norm_ on the shape denoiser + NaN-grad zeroing
    (train_3dfront.py:253-259)."""
    def clip_subtree(g):
        leaves = jax.tree_util.tree_leaves(g)
        if not leaves:
            return g
        norm = jnp.sqrt(sum(jnp.sum(x.astype(jnp.float32) ** 2) for x in leaves))
        scale = jnp.minimum(1.0, max_norm / jnp.maximum(norm, 1e-6))
        return jax.tree.map(lambda x: x * scale, g)

    if isinstance(grads, FrozenDict):
        grads = grads.unfreeze()
    if "shape_denoiser" in grads:
        grads = dict(grads)
        grads["shape_denoiser"] = clip_subtree(grads["shape_denoiser"])
    return jax.tree.map(lambda g: jnp.nan_to_num(g, nan=0.0), grads)


def clip_and_sanitize_transform(max_norm: float = 5.0):
    """`clip_and_sanitize_grads` as an optax transform, chained before adamw
    in `make_optimizer` so MultiSteps feeds it the accumulated MEAN grad."""
    def init(params):
        del params
        return optax.EmptyState()

    def update(updates, state, params=None):
        del params
        return clip_and_sanitize_grads(updates, max_norm), state

    return optax.GradientTransformation(init, update)


class SGDiff:
    """Host-side facade owning module + diffusion math + jitted entry points."""

    def __init__(self, cfg: EchoSceneConfig, num_objs: int, num_preds: int,
                 iou_stats: Optional[np.ndarray] = None):
        self.cfg = cfg
        self.module = EchoSceneModule(cfg, num_objs=num_objs, num_preds=num_preds)
        # inference twin: same param structure, bf16 (or experimental int8
        # W8A8 shape-UNet convs) compute; GroupNorm/softmax stay f32 inside
        # the modules either way
        # Built whenever sampling wants the bf16/int8 structure — even when
        # compute_dtype is ALSO bfloat16 (validated mixed-precision training,
        # BASELINE.md round-4 A/B): the twin's structural deltas (no remat,
        # factored upsample) only apply to the forward-only sampling path.
        if cfg.sample_dtype in ("bfloat16", "int8"):
            import copy as _copy
            infer_cfg = _copy.deepcopy(cfg)
            infer_cfg.compute_dtype = cfg.sample_dtype
            # rematerialisation only pays off in the backward pass; sampling
            # has none, so drop the nn.remat wrappers from the twin
            infer_cfg.layout_denoiser.use_checkpoint = False
            infer_cfg.shape_branch.denoiser.use_checkpoint = False
            if getattr(cfg, "sample_conv", "direct") == "winograd":
                infer_cfg.shape_branch.denoiser.winograd = True
            # exact factored upsample+conv: inference-only (its backward is
            # slower than repeat+conv's -- nn/blocks.py Upsample)
            infer_cfg.shape_branch.denoiser.factored_upsample = True
            infer_cfg.shape_branch.vqvae.factored_upsample = True
            self.module_infer = EchoSceneModule(infer_cfg, num_objs=num_objs,
                                                num_preds=num_preds)
        else:
            self.module_infer = self.module
        lc = cfg.layout_diffusion
        betas = S.get_betas(lc.schedule_type, lc.beta_start, lc.beta_end, lc.time_num)
        self.layout_diff = LayoutDiffusion(
            S.make_diffusion_tables(betas),
            model_mean_type=lc.model_mean_type, model_var_type=lc.model_var_type,
            loss_iou=lc.loss_iou, iou_type=lc.iou_type,
            iou_stats=None if iou_stats is None else jnp.asarray(iou_stats))
        self.is_echoscene = cfg.network_type == "echoscene"
        # built unconditionally (tiny (S,) tables): sample_fn dispatches on
        # the LIVE cfg.layout_diffusion.sampler, and call sites mutate the
        # cfg dataclasses — a conditional attribute here would be a trap
        self.layout_fast_tables = {
            "ddim": self.layout_diff.make_ddim_tables(lc.sample_steps),
            "dpmpp": self.layout_diff.make_dpmpp_tables(lc.sample_steps),
        }
        if self.is_echoscene:
            sd = cfg.shape_branch.denoiser
            self.shape_diff = ShapeDiffusion(S.make_diffusion_tables(
                S.ldm_linear_betas(sd.linear_start, sd.linear_end, sd.timesteps)))
            if cfg.shape_branch.sampler == "dpmpp":
                self.ddim_tables = self.shape_diff.make_dpmpp_tables(
                    cfg.shape_branch.ddim_steps)
            else:
                self.ddim_tables = self.shape_diff.make_ddim_tables(
                    cfg.shape_branch.ddim_steps, cfg.shape_branch.ddim_eta)
        self._train_step = None
        self._sample = None

    # ------------------------------------------------------------------
    def init(self, rng: jax.Array, batch: SceneBatch) -> TrainState:
        n = batch.num_nodes
        change = jnp.zeros((n, self.cfg.embedding_dim))
        # jit the whole init program: at flagship size (~260M params) eager
        # per-op init on a single CPU core takes ~15 min; compiled it's fast
        variables = jax.jit(self.module.init)(rng, batch, change)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        tx = make_optimizer(self.cfg, params)
        self._tx = tx
        opt_state = tx.init(params)
        return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                          batch_stats=batch_stats, opt_state=opt_state,
                          epoch=jnp.zeros((), jnp.int32))

    def ensure_tx(self, params):
        if not hasattr(self, "_tx"):
            self._tx = make_optimizer(self.cfg, params)
        return self._tx

    # ------------------------------------------------------------------
    def loss_fn(self, params, batch_stats, batch: SceneBatch, rng: jax.Array):
        cfg = self.cfg
        ld = self.layout_diff
        n = batch.num_nodes
        k_change, k_t, k_noise, k_ts, k_ns = jax.random.split(rng, 5)
        change = jax.random.normal(k_change, (n, cfg.embedding_dim))

        # layout branch: scene-shared t (diffusion_ddpm.py:600-603)
        t_box = ld.scene_shared_timesteps(k_t, batch.obj_to_scene,
                                          batch.num_scenes)
        x0 = box_vec_from_boxes(batch.boxes)
        noise_box = jax.random.normal(k_noise, x0.shape)
        box_xt = ld.q_sample(x0, t_box, noise_box)

        kwargs: Dict[str, Any] = {}
        noise_shape = t_shape = None
        if self.is_echoscene:
            sd = self.shape_diff
            m = batch.shapes.capacity
            r = cfg.shape_branch.denoiser.image_size
            zc = cfg.shape_branch.vqvae.embed_dim
            t_shape = jax.random.randint(k_ts, (m,), 0, sd.num_timesteps)
            noise_shape = jax.random.normal(k_ns, (m, r, r, r, zc))
            kwargs = dict(shape_noise=noise_shape, t_shape=t_shape,
                          sqrt_ac=sd.t.sqrt_alphas_cumprod[t_shape],
                          sqrt_1m_ac=sd.t.sqrt_one_minus_alphas_cumprod[t_shape])

        outs, mutated = self.module.apply(
            {"params": params, "batch_stats": batch_stats},
            batch, change, box_xt, t_box, mutable=["batch_stats"],
            method=EchoSceneModule.train_forward, **kwargs)

        # layout loss (diffusion_loss :451-477), target = noise (eps param)
        sq = (noise_box - outs["eps_box"]) ** 2
        om = batch.dec.obj_mask
        per = lambda a: jnp.mean(a, axis=-1)
        layout_diag = {
            "loss.size": masked_mean(per(sq[:, :3]), om),
            "loss.trans": masked_mean(per(sq[:, 3:6]), om),
            "loss.angle": masked_mean(per(sq[:, 6:8]), om),
            "loss.bbox": masked_mean(per(sq[:, :8]), om),
        }
        layout_loss = layout_diag["loss.bbox"]
        if ld.loss_iou:
            liou, biou = ld.iou_loss(box_xt, t_box, outs["eps_box"],
                                     batch.same_scene_matrix(), om)
            layout_loss = layout_loss + liou
            layout_diag.update({"loss.liou": liou, "loss.bbox_iou": biou})
        else:
            layout_diag.update({"loss.liou": jnp.zeros(()),
                                "loss.bbox_iou": jnp.zeros(())})

        total = layout_loss
        shape_diag = {}
        if self.is_echoscene:
            sm = outs["shape_mask"]
            axes = tuple(range(1, noise_shape.ndim))
            per_obj = jnp.mean((outs["eps_shape"] - noise_shape) ** 2, axis=axes)
            loss_simple = masked_mean(per_obj, sm)
            loss_vlb = masked_mean(self.shape_diff.t.lvlb_weights[t_shape] * per_obj, sm)
            shape_loss = loss_simple  # l_simple_weight 1, elbo weight 0
            shape_diag = {"loss_total": shape_loss, "loss_simple": loss_simple,
                          "loss_vlb": loss_vlb}
            total = total + shape_loss
        else:
            shape_loss = jnp.zeros(())

        metrics = {"layout_loss": layout_loss, "shape_loss": shape_loss,
                   **layout_diag, **shape_diag}
        return total, (mutated.get("batch_stats", batch_stats), metrics)

    def build_train_step(self, donate: bool = True):
        tx_holder = {}

        def step_fn(state: TrainState, batch: SceneBatch, rng: jax.Array):
            (loss, (new_bs, metrics)), grads = jax.value_and_grad(
                self.loss_fn, has_aux=True)(state.params, state.batch_stats,
                                            batch, rng)
            # clip/NaN-sanitize happen inside tx (make_optimizer) so that
            # grad accumulation clips the accumulated mean, not microbatches
            tx = tx_holder["tx"]
            updates, new_opt = tx.update(grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            metrics["loss"] = loss
            metrics["grad_norm"] = optax.global_norm(grads)  # pre-clip
            new_state = state.replace(step=state.step + 1, params=new_params,
                                      batch_stats=new_bs, opt_state=new_opt)
            return new_state, metrics

        def make(state):
            tx_holder["tx"] = self.ensure_tx(state.params)
            return jax.jit(step_fn, donate_argnums=(0,) if donate else ())

        return make

    def train_step(self, state: TrainState, batch: SceneBatch, rng: jax.Array,
                   donate: bool = False):
        """One optimizer step.  `donate=True` (used by the Trainer) donates the
        input state's buffers — callers must not reuse it afterwards."""
        if self._train_step is None:
            self._train_step = self.build_train_step(donate=donate)(state)
        return self._train_step(state, batch, rng)

    # ------------------------------------------------------------------
    def _context(self, variables, batch: SceneBatch, change: jnp.ndarray,
                 splice: bool):
        return self.module_infer.apply(
            variables, batch, change, splice_untouched=splice,
            method=EchoSceneModule.encode_context)

    def sample_fn(self, params, batch_stats, batch: SceneBatch, rng: jax.Array,
                  gen_shape: bool = True, with_manipulation: bool = False,
                  decode_chunk: int = 8, shape_rows: Optional[int] = None):
        """Generate layout (full DDPM chain) and shapes (DDIM + VQ decode).

        Mirrors Sg2ScDiffModel.sample (:388-420); with_manipulation covers
        sample_with_changes/_additions (:422-532): change noise on flagged
        nodes + latent splicing for untouched ones.

        shape_rows: STATIC row count for the shape chain.  Nodes are
        scene-major with all padding at the global tail (core/graphbatch.py),
        so running the 100-step DDIM chain + VQ decode over only the first
        `shape_rows` slots skips the padded tail at identical per-real-node
        outputs (the reference denoises every node of the batch,
        echo2shape.py:497-510 — padding is purely our collate artifact).
        Must be >= the batch's real-node count (use `shape_row_capacity`);
        shape outputs for slots >= shape_rows are zeros.
        """
        if self.module_infer is not self.module:
            # pre-cast the f32 master params to bf16 ONCE per sampling call,
            # guaranteeing the scan closures hold bf16 buffers (no per-step
            # converts inside the chains); flax's per-op casts become no-ops.
            params = jax.tree.map(
                lambda x: x.astype(jnp.bfloat16)
                if x.dtype == jnp.float32 else x, params)
        variables = {"params": params, "batch_stats": batch_stats}
        n = batch.num_nodes
        k_change, k_box, k_shape = jax.random.split(rng, 3)
        if with_manipulation:
            change = jax.random.normal(k_change, (n, self.cfg.embedding_dim))
            splice = not self.cfg.replace_latent
        else:
            change = jnp.zeros((n, self.cfg.embedding_dim))
            splice = False
        ctx = self._context(variables, batch, change, splice)

        # Both sampling chains run over a compacted row prefix: nodes are
        # scene-major with all padding at the global tail (core/graphbatch.py),
        # so clipping triple endpoints into [0, m) and masking edges that
        # would touch a dropped slot is exact — real triples only reference
        # real nodes, all of which live in the prefix (select_shape_subbatch
        # applies the same remap for training).
        m = n if shape_rows is None else min(int(shape_rows), n)
        if m < n:
            s, o = batch.dec.triples[:, 0], batch.dec.triples[:, 2]
            tri_mask = (batch.dec.triple_mask
                        * (s < m).astype(jnp.float32)
                        * (o < m).astype(jnp.float32))
            triples = jnp.stack([jnp.minimum(s, m - 1),
                                 batch.dec.triples[:, 1],
                                 jnp.minimum(o, m - 1)], axis=1)
            obj_mask = batch.dec.obj_mask[:m]
        else:
            triples, tri_mask = batch.dec.triples, batch.dec.triple_mask
            obj_mask = batch.dec.obj_mask

        def box_denoise(x, t):
            return self.module_infer.apply(
                variables, x, t, ctx["obj_embed"][:m], batch,
                method=EchoSceneModule.layout_eps,
                triples=triples, obj_mask=obj_mask, triple_mask=tri_mask)

        box_shape = (m, self.cfg.layout_denoiser.in_channels)
        lc = self.cfg.layout_diffusion
        if lc.sampler == "ddpm":
            # noise_rows=n keeps every row's noise realisation identical to
            # the uncompacted chain — compaction is bit-exact per real row
            vec8 = self.layout_diff.sample_chain(
                box_denoise, box_shape, k_box, clip_denoised=False,
                noise_rows=n)
        else:
            k_box, k_init = jax.random.split(k_box)
            x_T = jax.random.normal(
                k_init, (n, self.cfg.layout_denoiser.in_channels))[:m]
            vec8 = self.layout_diff.sample_chain_fast(
                box_denoise, box_shape, k_box,
                self.layout_fast_tables[lc.sampler], method=lc.sampler,
                x_T=x_T)
        if m < n:
            vec8 = jnp.concatenate(
                [vec8, jnp.zeros((n - m, vec8.shape[1]), vec8.dtype)], 0)
        out = dict(self.layout_diff.split_sample(vec8))
        out["keep"] = 1.0 - batch.change_flags

        if gen_shape and self.is_echoscene:
            sd_cfg = self.cfg.shape_branch
            r = sd_cfg.denoiser.image_size
            zc = sd_cfg.vqvae.embed_dim
            uc_s = ctx["uc_s"][:m, None, :]

            def shape_denoise(z, t):
                return self.module_infer.apply(
                    variables, z, t, uc_s, triples, obj_mask, tri_mask,
                    method=EchoSceneModule.shape_eps)

            x_T = self.shape_diff.shared_noise(k_shape, m, (r, r, r, zc))
            if sd_cfg.sampler == "dpmpp":
                z0 = self.shape_diff.dpmpp_sample_chain(
                    shape_denoise, (m, r, r, r, zc), k_shape,
                    self.ddim_tables, x_T=x_T)
            else:
                z0 = self.shape_diff.ddim_sample_chain(
                    shape_denoise, (m, r, r, r, zc), k_shape,
                    self.ddim_tables, x_T=x_T)
            # chunked VQ decode to bound memory (64^3 output grids); the
            # latent rows are zero-padded up to a chunk multiple so the chain
            # row count m can be EXACT (no multiple-of-4 rounding tax on the
            # 100-step chain) while the decode still runs well-shaped chunks
            mp = -(-m // decode_chunk) * decode_chunk
            if mp > m:
                z0 = jnp.concatenate(
                    [z0, jnp.zeros((mp - m,) + z0.shape[1:], z0.dtype)], 0)
            if mp > decode_chunk:
                zc_ = z0.reshape(mp // decode_chunk, decode_chunk,
                                 *z0.shape[1:])
                sdf = jax.lax.map(lambda z: self.module_infer.apply(
                    variables, z, method=EchoSceneModule.decode_latent), zc_)
                sdf = sdf.reshape(mp, *sdf.shape[2:])
            else:
                sdf = self.module_infer.apply(variables, z0,
                                        method=EchoSceneModule.decode_latent)
            if mp > m:
                sdf = sdf[:m]
            if m < n:
                sdf = jnp.concatenate(
                    [sdf, jnp.zeros((n - m,) + sdf.shape[1:], sdf.dtype)], 0)
            out["shapes"] = sdf
        return out

    def sample(self, state: TrainState, batch: SceneBatch, rng: jax.Array,
               gen_shape: bool = True, with_manipulation: bool = False,
               compact: bool = True):
        if self._sample is None:
            self._sample = jax.jit(
                functools.partial(self.sample_fn),
                static_argnames=("gen_shape", "with_manipulation",
                                 "shape_rows"))
        rows = shape_row_capacity(batch) if compact else None
        return self._sample(state.params, state.batch_stats, batch, rng,
                            gen_shape=gen_shape,
                            with_manipulation=with_manipulation,
                            shape_rows=rows)
