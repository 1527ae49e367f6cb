"""Layout-branch Gaussian diffusion: training losses + scanned ancestral sampling.

Behavioral reference: /root/reference/model/networks/diffusion_layout/
diffusion_ddpm.py:118-632.  Semantics preserved:
  * angle -> (sin, cos) preprocessing inside the loss (p_losses :488-489),
  * ONE shared timestep per scene, not per object (get_loss_iter :600-603),
  * eps- and x0-parameterisations, fixedsmall/fixedlarge variances,
  * per-component (size/trans/angle) MSE diagnostics (diffusion_loss :451-477),
  * optional axis-aligned IoU collision loss weighted by alpha_cumprod
    (IoU_loss :384-426), masked to same-scene off-diagonal pairs,
  * ancestral sampling loop (p_sample_loop_sg :330-345) — but as ONE
    `lax.scan` over the full chain instead of 1000 host round-trips.

The denoise function is passed in as a closure `eps_fn(x_t, t) -> eps` that
already captures the graph context (obj embeddings, triples, masks); this file
is pure diffusion math.
"""
from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.schedules import (DiffusionTables, DDIMTables, ddim_tables,
                              ddim_timesteps)
from ..core.boxes import angle_to_sincos, descale_box_params, sincos_to_angle


def _extract(table: jnp.ndarray, t: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """Gather per-timestep coefficients, broadcast to `ndim` dims."""
    out = table[t]
    return out.reshape(out.shape[0], *((1,) * (ndim - 1)))


def masked_mean(x: jnp.ndarray, mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    if mask is None:
        return jnp.mean(x)
    return jnp.sum(x * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def normal_kl(mean1, logvar1, mean2, logvar2):
    """KL between diagonal Gaussians (diffusion_ddpm.py:89-94)."""
    return 0.5 * (-1.0 + logvar2 - logvar1 + jnp.exp(logvar1 - logvar2)
                  + (mean1 - mean2) ** 2 * jnp.exp(-logvar2))


def discretized_gaussian_log_likelihood(x, *, means, log_scales):
    """Log-likelihood of a 1/255-discretized Gaussian
    (diffusion_ddpm.py:96-116; defined for [0,1]-scaled integer data)."""
    import jax.scipy.stats as jstats
    centered = x - means
    inv_stdv = jnp.exp(-log_scales)
    cdf_plus = jstats.norm.cdf(inv_stdv * (centered + 0.5))
    cdf_min = jstats.norm.cdf(inv_stdv * (centered - 0.5))
    log_cdf_plus = jnp.log(jnp.maximum(cdf_plus, 1e-12))
    log_one_minus_cdf_min = jnp.log(jnp.maximum(1.0 - cdf_min, 1e-12))
    cdf_delta = cdf_plus - cdf_min
    return jnp.where(
        x < 0.001, log_cdf_plus,
        jnp.where(x > 0.999, log_one_minus_cdf_min,
                  jnp.log(jnp.maximum(cdf_delta, 1e-12))))


class LayoutDiffusion:
    """Stateless layout DDPM over (N, 8) box vectors."""

    def __init__(self, tables: DiffusionTables,
                 model_mean_type: str = "eps",
                 model_var_type: str = "fixedsmall",
                 size_dim: int = 3, translation_dim: int = 3, angle_dim: int = 2,
                 loss_iou: bool = False, iou_type: str = "aabb",
                 iou_stats: Optional[jnp.ndarray] = None):
        import dataclasses
        self.t = dataclasses.replace(tables, **{
            f.name: jnp.asarray(getattr(tables, f.name))
            for f in dataclasses.fields(tables)})
        self.num_timesteps = tables.num_timesteps
        self.model_mean_type = model_mean_type
        self.model_var_type = model_var_type
        self.size_dim = size_dim
        self.translation_dim = translation_dim
        self.angle_dim = angle_dim
        self.bbox_dim = size_dim + translation_dim + angle_dim
        self.loss_iou = loss_iou
        self.iou_type = iou_type
        self.iou_stats = iou_stats
        self._fixedlarge_logvar = jnp.asarray(tables.fixedlarge_log_variance())

    # --- forward process -------------------------------------------------
    def q_sample(self, x0: jnp.ndarray, t: jnp.ndarray,
                 noise: jnp.ndarray) -> jnp.ndarray:
        return (_extract(self.t.sqrt_alphas_cumprod, t, x0.ndim) * x0 +
                _extract(self.t.sqrt_one_minus_alphas_cumprod, t, x0.ndim) * noise)

    def predict_xstart_from_eps(self, x_t, t, eps):
        return (_extract(self.t.sqrt_recip_alphas_cumprod, t, x_t.ndim) * x_t -
                _extract(self.t.sqrt_recipm1_alphas_cumprod, t, x_t.ndim) * eps)

    def q_posterior_mean(self, x0, x_t, t):
        return (_extract(self.t.posterior_mean_coef1, t, x_t.ndim) * x0 +
                _extract(self.t.posterior_mean_coef2, t, x_t.ndim) * x_t)

    def model_log_variance(self, t, ndim):
        if self.model_var_type == "fixedsmall":
            return _extract(self.t.posterior_log_variance_clipped, t, ndim)
        if self.model_var_type == "fixedlarge":
            return _extract(self._fixedlarge_logvar, t, ndim)
        raise NotImplementedError(self.model_var_type)

    # --- training --------------------------------------------------------
    def scene_shared_timesteps(self, rng: jax.Array, obj_to_scene: jnp.ndarray,
                               num_scenes: int) -> jnp.ndarray:
        """Per-scene t gathered to objects (get_loss_iter :600-603).

        obj_to_scene may contain `num_scenes` for padded rows -> extra slot.
        """
        t_scene = jax.random.randint(rng, (num_scenes + 1,), 0, self.num_timesteps)
        return t_scene[obj_to_scene]

    def p_losses(self, denoise_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
                 boxes7: jnp.ndarray, t: jnp.ndarray, rng: jax.Array,
                 obj_mask: Optional[jnp.ndarray] = None,
                 same_scene: Optional[jnp.ndarray] = None,
                 ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        """boxes7: (N, 7) scaled boxes with raw angle; returns (loss, diag dict)."""
        x0 = jnp.concatenate(
            [boxes7[:, :6], angle_to_sincos(boxes7[:, 6:7])], axis=-1)
        noise = jax.random.normal(rng, x0.shape, x0.dtype)
        x_t = self.q_sample(x0, t, noise)
        target = noise if self.model_mean_type == "eps" else x0
        out = denoise_fn(x_t, t)

        sd, td = self.size_dim, self.translation_dim
        per_obj = lambda a: jnp.mean(a, axis=-1)
        sq = (target - out) ** 2
        loss_size = masked_mean(per_obj(sq[:, :sd]), obj_mask)
        loss_trans = masked_mean(per_obj(sq[:, sd:sd + td]), obj_mask)
        loss_angle = masked_mean(per_obj(sq[:, sd + td:self.bbox_dim]), obj_mask)
        loss_bbox = masked_mean(per_obj(sq[:, :self.bbox_dim]), obj_mask)
        losses = masked_mean(per_obj(sq), obj_mask)

        loss_iou = jnp.zeros(())
        mean_iou = jnp.zeros(())
        if self.loss_iou:
            loss_iou, mean_iou = self.iou_loss(x_t, t, out, same_scene, obj_mask)
        total = losses + loss_iou
        return total, {
            "loss.bbox": loss_bbox, "loss.trans": loss_trans,
            "loss.size": loss_size, "loss.angle": loss_angle,
            "loss.liou": loss_iou, "loss.bbox_iou": mean_iou,
        }

    def iou_loss(self, x_t, t, pred, same_scene, obj_mask):
        """IoU collision penalty (diffusion_ddpm.py:384-426): descale predicted
        boxes to world units, pairwise same-scene overlap, weighted by
        alpha_cumprod(t).  iou_type 'aabb' = axis-aligned exact; 'obb' =
        differentiable soft rotated overlap (core/box_overlap.py — the
        reference's own obb path is unreachable, its import is commented out).
        """
        if self.model_mean_type == "eps":
            x_recon = self.predict_xstart_from_eps(x_t, t, pred)
        else:
            x_recon = pred
        assert self.iou_stats is not None, "loss_iou requires box stats"
        boxes = descale_box_params(x_recon[:, :6], self.iou_stats)
        if self.iou_type == "obb":
            from ..core.box_overlap import soft_rotated_iou_matrix
            yaw = sincos_to_angle(x_recon[:, 6:8])[:, 0]
            boxes7 = jnp.concatenate([boxes, yaw[:, None]], axis=-1)
            iou = soft_rotated_iou_matrix(boxes7)
        else:
            size, center = boxes[:, :3], boxes[:, 3:6]
            lo = center - size / 2.0
            hi = center + size / 2.0
            inter_lo = jnp.maximum(lo[:, None, :], lo[None, :, :])
            inter_hi = jnp.minimum(hi[:, None, :], hi[None, :, :])
            inter = jnp.prod(jnp.clip(inter_hi - inter_lo, 0.0, None), axis=-1)
            vol = jnp.prod(jnp.clip(hi - lo, 0.0, None), axis=-1)
            union = vol[:, None] + vol[None, :] - inter
            iou = inter / jnp.maximum(union, 1e-8)
        iou = jnp.nan_to_num(iou)
        w = self.t.alphas_cumprod[t][:, None]
        pair_mask = same_scene if same_scene is not None else 1.0
        num = jnp.maximum(jnp.sum(pair_mask), 1.0)
        liou = jnp.sum(w * 0.5 * (iou + 1e-6) * pair_mask) / num
        mean_iou = jnp.sum(iou * pair_mask) / num
        return liou, mean_iou

    # --- variational bound / bits-per-dim --------------------------------
    def q_mean_variance(self, x0, t):
        """q(x_t | x_0) moments (diffusion_ddpm.py:182-189)."""
        mean = _extract(self.t.sqrt_alphas_cumprod, t, x0.ndim) * x0
        variance = _extract(1.0 - self.t.alphas_cumprod, t, x0.ndim)
        log_variance = _extract(self.t.log_one_minus_alphas_cumprod, t, x0.ndim)
        return mean, variance, log_variance

    def vb_terms(self, denoise_fn, x0, x_t, t, clip_denoised: bool = True):
        """Per-example KL[q(x_{t-1}|x_t,x_0) || p(x_{t-1}|x_t)] in bits
        (_vb_terms_bpd, diffusion_ddpm.py:375-383).  Returns (kl_b, pred_x0)."""
        true_mean = self.q_posterior_mean(x0, x_t, t)
        true_logvar = _extract(self.t.posterior_log_variance_clipped, t, x_t.ndim)
        out = denoise_fn(x_t, t)
        if self.model_mean_type == "eps":
            x_recon = self.predict_xstart_from_eps(x_t, t, out)
        else:
            x_recon = out
        if clip_denoised:
            x_recon = jnp.clip(x_recon, -1.0, 1.0)  # p_mean_variance :241-242
        model_mean = self.q_posterior_mean(x_recon, x_t, t)
        model_logvar = self.model_log_variance(t, x_t.ndim)
        kl = normal_kl(true_mean, true_logvar, model_mean, model_logvar)
        kl = jnp.mean(kl, axis=tuple(range(1, kl.ndim))) / jnp.log(2.0)
        return kl, x_recon

    def prior_bpd(self, x0):
        """KL[q(x_T|x_0) || N(0, I)] in bits (_prior_bpd :510-519)."""
        b = x0.shape[0]
        t = jnp.full((b,), self.num_timesteps - 1, jnp.int32)
        qt_mean, _, qt_logvar = self.q_mean_variance(x0, t)
        kl = normal_kl(qt_mean, qt_logvar, jnp.zeros_like(qt_mean),
                       jnp.zeros_like(qt_logvar))
        return jnp.mean(kl, axis=tuple(range(1, kl.ndim))) / jnp.log(2.0)

    def calc_bpd(self, denoise_fn, x0, rng: jax.Array,
                 clip_denoised: bool = True):
        """Full variational bound, every timestep (calc_bpd_loop :521-548) —
        one lax.scan over T instead of the reference's Python loop with
        masked writes.  Returns dict with scalars total_bpd / prior_bpd /
        vb_mean / mse_mean and the (T, B) per-term arrays."""
        b = x0.shape[0]

        def body(key, t_scalar):
            key, nk = jax.random.split(key)
            t_b = jnp.full((b,), t_scalar, jnp.int32)
            noise = jax.random.normal(nk, x0.shape, x0.dtype)
            x_t = self.q_sample(x0, t_b, noise)
            kl_b, pred_x0 = self.vb_terms(denoise_fn, x0, x_t, t_b,
                                          clip_denoised)
            mse_b = jnp.mean((pred_x0 - x0) ** 2,
                             axis=tuple(range(1, x0.ndim)))
            return key, (kl_b, mse_b)

        ts = jnp.arange(self.num_timesteps - 1, -1, -1)
        _, (vals_tb, mse_tb) = jax.lax.scan(body, rng, ts)
        prior_b = self.prior_bpd(x0)
        total_b = jnp.sum(vals_tb, axis=0) + prior_b
        return {
            "total_bpd": jnp.mean(total_b),
            "prior_bpd": jnp.mean(prior_b),
            "vb_mean": jnp.mean(vals_tb),
            "mse_mean": jnp.mean(mse_tb),
            "vb_terms": vals_tb,
            "mse_terms": mse_tb,
        }

    # --- sampling --------------------------------------------------------
    def sample_chain(self, denoise_fn, shape: Tuple[int, ...], rng: jax.Array,
                     clip_denoised: bool = False,
                     noise_rows: Optional[int] = None) -> jnp.ndarray:
        """Full T-step ancestral sampling as one lax.scan.

        denoise_fn(x_t, t_vec) -> model output (eps or x0 depending on
        parameterisation).  Matches p_sample_loop_sg (:330-345).

        noise_rows: when the chain runs over a compacted row prefix (rows
        < full batch), drawing noise at `noise_rows` rows and slicing keeps
        each row's noise realisation IDENTICAL to the uncompacted chain —
        compaction stays bit-exact per real row.
        """
        nr = shape[0] if noise_rows is None else max(noise_rows, shape[0])
        nshape = (nr,) + shape[1:]
        rng, init_rng = jax.random.split(rng)
        x_T = jax.random.normal(init_rng, nshape)[:shape[0]]

        def step(carry, t_scalar):
            x, key = carry
            key, nkey = jax.random.split(key)
            t_vec = jnp.full((shape[0],), t_scalar, jnp.int32)
            out = denoise_fn(x, t_vec)
            if self.model_mean_type == "eps":
                x_recon = self.predict_xstart_from_eps(x, t_vec, out)
            else:
                x_recon = out
            if clip_denoised:
                x_recon = jnp.clip(x_recon, -1.0, 1.0)
            mean = self.q_posterior_mean(x_recon, x, t_vec)
            logvar = self.model_log_variance(t_vec, x.ndim)
            noise = jax.random.normal(nkey, nshape, x.dtype)[:shape[0]]
            nonzero = (t_scalar > 0).astype(x.dtype)
            x_next = mean + nonzero * jnp.exp(0.5 * logvar) * noise
            return (x_next, key), None

        ts = jnp.arange(self.num_timesteps - 1, -1, -1)
        (x0, _), _ = jax.lax.scan(step, (x_T, rng), ts)
        return x0

    def make_ddim_tables(self, num_steps: int, eta: float = 0.0) -> DDIMTables:
        """Sub-schedule for the optional fast layout samplers.

        New TPU-side capability: the reference only ever runs the full
        1000-step ancestral chain for layouts (p_sample_loop_sg :330-345);
        exposing the same DDIM/DPM-Solver++ machinery the shape branch uses
        lets eval trade steps for throughput without touching the model.
        """
        import numpy as np
        steps = ddim_timesteps(num_steps, self.num_timesteps)
        return ddim_tables(np.asarray(self.t.alphas_cumprod), steps, eta)

    def make_dpmpp_tables(self, num_steps: int) -> DDIMTables:
        """Lambda-uniform sub-schedule for the DPM-Solver++ fast mode."""
        import numpy as np
        from ..core.schedules import lambda_uniform_timesteps
        ac = np.asarray(self.t.alphas_cumprod)
        return ddim_tables(ac, lambda_uniform_timesteps(num_steps, ac), 0.0)

    def sample_chain_fast(self, denoise_fn, shape: Tuple[int, ...],
                          rng: jax.Array, tables: DDIMTables,
                          method: str = "ddim",
                          x_T: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """Few-step layout sampling (eps parameterisation only)."""
        assert self.model_mean_type == "eps", self.model_mean_type
        from .samplers import CHAINS
        return CHAINS[method](denoise_fn, shape, rng, tables, x_T=x_T)

    @staticmethod
    def split_sample(vec8: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        """(N, 8) -> sizes/translations/angles dict (echo2layout.py:120-124)."""
        return {
            "sizes": vec8[:, 0:3],
            "translations": vec8[:, 3:6],
            "angles": sincos_to_angle(vec8[:, 6:8]),
        }
