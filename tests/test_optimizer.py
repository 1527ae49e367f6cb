"""Optimizer-chain semantics (no model compile — fast).

The reference clips the shape-branch grad ONCE per optimizer step on the full
effective-batch grad (train_3dfront.py:253-259).  Under grad accumulation our
clip/NaN-sanitize therefore live INSIDE the inner optax chain so MultiSteps
feeds them the accumulated MEAN — clip(mean(g_i)), not mean(clip(g_i)).
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax

from echoscene_tpu.models.config import tiny_config
from echoscene_tpu.models.sgdiff import (clip_and_sanitize_grads,
                                         make_optimizer)


def _params():
    return {"shape_denoiser": {"w": jnp.zeros((3,))},
            "gcn": {"w": jnp.zeros((2,))}}


def test_accum_clips_the_mean_not_the_microbatches():
    cfg = tiny_config("echolayout")
    cfg.grad_accum = 2
    params = _params()
    tx = make_optimizer(cfg, params)
    st = tx.init(params)

    # two microbatch grads, each ABOVE the norm-5 clip, different directions
    g1 = {"shape_denoiser": {"w": jnp.array([12.0, 0.0, 0.0])},
          "gcn": {"w": jnp.array([1.0, 0.0])}}
    g2 = {"shape_denoiser": {"w": jnp.array([0.0, 12.0, 0.0])},
          "gcn": {"w": jnp.array([0.0, 1.0])}}

    u1, st = tx.update(g1, st, params)
    # microstep 1: update deferred (zeros)
    assert all(np.all(np.asarray(x) == 0) for x in jax.tree.leaves(u1))
    u2, st = tx.update(g2, st, params)
    p_accum = optax.apply_updates(params, u2)

    # expected: adamw(lr) applied to clip(mean(g1, g2))
    mean = jax.tree.map(lambda a, b: (a + b) / 2, g1, g2)
    clipped = clip_and_sanitize_grads(mean)
    ref_tx = optax.adamw(cfg.lr_init)
    ref_st = ref_tx.init(params)
    ru, _ = ref_tx.update(clipped, ref_st, params)
    p_ref = optax.apply_updates(params, ru)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                atol=1e-7),
        p_accum, p_ref)

    # sanity: mean(clip(g_i)) differs from clip(mean) here, so the test
    # genuinely discriminates the two orderings
    mc = jax.tree.map(lambda a, b: (a + b) / 2,
                      clip_and_sanitize_grads(g1), clip_and_sanitize_grads(g2))
    assert not np.allclose(np.asarray(mc["shape_denoiser"]["w"]),
                           np.asarray(clipped["shape_denoiser"]["w"]))


def test_nan_grads_zeroed_at_apply():
    cfg = tiny_config("echolayout")
    params = _params()
    tx = make_optimizer(cfg, params)
    st = tx.init(params)
    g = {"shape_denoiser": {"w": jnp.array([jnp.nan, 1.0, 0.0])},
         "gcn": {"w": jnp.array([jnp.nan, 0.5])}}
    u, _ = tx.update(g, st, params)
    assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree.leaves(u))
