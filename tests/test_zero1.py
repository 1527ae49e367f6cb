"""ZeRO-1 sharded-optimizer path (parallel/zero.py).

Fast tests: the flat-space sharded AdamW update must match the optax chain
(`models.sgdiff.make_optimizer`) step-for-step on a toy pytree — clip,
NaN-sanitize, frozen-VQ masking and the lr schedule included.
Slow tests: the full-model zero1 train step matches build_dp_train_step.
"""
import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest
from jax.flatten_util import ravel_pytree
from jax.sharding import PartitionSpec as P

from echoscene_tpu.parallel.mesh import make_mesh
from echoscene_tpu.parallel.zero import (Zero1State, _flat_masks,
                                         init_zero1_state,
                                         build_zero1_train_step,
                                         zero1_update_shard)


def _toy_params(rng):
    return {
        "vqvae": {"kernel": jnp.asarray(rng.normal(size=(4, 3)), jnp.float32)},
        "shape_denoiser": {
            "a": jnp.asarray(rng.normal(size=(7,)), jnp.float32),
            "b": jnp.asarray(rng.normal(size=(3, 5)), jnp.float32)},
        "layout_denoiser": {"w": jnp.asarray(rng.normal(size=(6,)),
                                             jnp.float32)},
    }


def _run_zero1(params, grad_seq, lr_fn, n_dev=4):
    """Drive zero1_update_shard through shard_map with every device holding
    the same full gradient (psum_scatter/n == the plain mean)."""
    mesh = make_mesh((n_dev,), ("data",), jax.devices()[:n_dev])
    tmask, cmask, n = _flat_masks(params)
    n_pad = -(-n // n_dev) * n_dev
    pad = n_pad - n
    tm = jnp.asarray(np.pad(tmask, (0, pad)))
    cm = jnp.asarray(np.pad(cmask, (0, pad)))
    chunk = n_pad // n_dev

    def local(flat_p, flat_g, mu, nu, count, tm, cm):
        g_shard = jax.lax.psum_scatter(flat_g, "data", scatter_dimension=0,
                                       tiled=True) / n_dev
        idx = jax.lax.axis_index("data")
        p_shard = jax.lax.dynamic_slice(flat_p, (idx * chunk,), (chunk,))
        new_p, mu, nu, t = zero1_update_shard(
            g_shard, p_shard, mu, nu, count, tm, cm, lr_fn, "data")
        flat = jax.lax.all_gather(new_p, "data", axis=0, tiled=True)
        return flat, mu, nu, t

    mapped = jax.jit(jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(), P("data"), P("data"), P("data"), P(), P("data"),
                  P("data")),
        out_specs=(P(), P("data"), P("data"), P()),
        check_vma=False))

    flat_p, unravel = ravel_pytree(params)
    flat_p = jnp.pad(flat_p, (0, pad))
    mu = jnp.zeros((n_pad,), jnp.float32)
    nu = jnp.zeros((n_pad,), jnp.float32)
    count = jnp.zeros((), jnp.int32)
    for grads in grad_seq:
        flat_g = jnp.pad(ravel_pytree(grads)[0], (0, pad))
        # every device contributes the SAME full grad
        stacked_g = jnp.tile(flat_g.reshape(1, -1),
                             (n_dev, 1)).reshape(-1)
        flat_p, mu, nu, count = mapped(flat_p, stacked_g, mu, nu, count,
                                       tm, cm)
    return unravel(flat_p[:n])


def _run_optax(params, grad_seq, cfg):
    from echoscene_tpu.models.sgdiff import make_optimizer
    tx = make_optimizer(cfg, params)
    opt = tx.init(params)
    for grads in grad_seq:
        updates, opt = tx.update(grads, opt, params)
        params = optax.apply_updates(params, updates)
    return params


def _tiny_cfg():
    from echoscene_tpu.models.config import tiny_config
    return tiny_config()


def test_zero1_update_matches_optax_chain(rng):
    from echoscene_tpu.models.sgdiff import lr_schedule
    cfg = _tiny_cfg()
    params = _toy_params(rng)
    # step 2's shape-denoiser grads are scaled up so the norm-5 clip engages
    grad_seq = []
    for i, scale in enumerate([1.0, 40.0, 0.3]):
        g = jax.tree.map(lambda x: jnp.asarray(
            rng.normal(size=x.shape), jnp.float32), params)
        g["shape_denoiser"] = jax.tree.map(lambda x: x * scale,
                                           g["shape_denoiser"])
        grad_seq.append(g)

    got = _run_zero1(params, grad_seq, lr_schedule(cfg))
    want = _run_optax(params, grad_seq, cfg)
    for k in params:
        for a, b in zip(jax.tree_util.tree_leaves(got[k]),
                        jax.tree_util.tree_leaves(want[k])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-6, err_msg=k)
    # frozen subtree bit-identical to the input
    np.testing.assert_array_equal(np.asarray(got["vqvae"]["kernel"]),
                                  np.asarray(params["vqvae"]["kernel"]))


def test_zero1_nan_grads_zero_the_clip_subtree(rng):
    """A NaN inside the shape-denoiser grads poisons the subtree norm and the
    sanitize zeroes the WHOLE subtree — in both paths identically."""
    from echoscene_tpu.models.sgdiff import lr_schedule
    cfg = _tiny_cfg()
    params = _toy_params(rng)
    g = jax.tree.map(lambda x: jnp.asarray(rng.normal(size=x.shape),
                                           jnp.float32), params)
    g["shape_denoiser"]["a"] = g["shape_denoiser"]["a"].at[0].set(jnp.nan)

    got = _run_zero1(params, [g], lr_schedule(cfg))
    want = _run_optax(params, [g], cfg)
    for a, b in zip(jax.tree_util.tree_leaves(got),
                    jax.tree_util.tree_leaves(want)):
        assert np.all(np.isfinite(np.asarray(a)))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_flat_masks_line_up_with_ravel_order(rng):
    params = _toy_params(rng)
    tmask, cmask, n = _flat_masks(params)
    flat, unravel = ravel_pytree(params)
    assert n == flat.size
    # mark the clip subtree via the mask, unravel, check it landed on
    # shape_denoiser leaves only
    marked = unravel(jnp.asarray(cmask, jnp.float32))
    assert np.all(np.asarray(marked["shape_denoiser"]["a"]) == 1)
    assert np.all(np.asarray(marked["shape_denoiser"]["b"]) == 1)
    assert np.all(np.asarray(marked["vqvae"]["kernel"]) == 0)
    assert np.all(np.asarray(marked["layout_denoiser"]["w"]) == 0)
    trained = unravel(jnp.asarray(tmask, jnp.float32))
    assert np.all(np.asarray(trained["vqvae"]["kernel"]) == 0)
    assert np.all(np.asarray(trained["layout_denoiser"]["w"]) == 1)


# ---------------------------------------------------------------- slow: full model


@pytest.mark.slow
def test_zero1_full_step_matches_dp():
    """Two zero1 train steps == two replicated dp train steps (same shards,
    same keys), with the moments actually sharded over 'data'."""
    from echoscene_tpu.parallel.dp import build_dp_train_step
    from echoscene_tpu.parallel.mesh import stack_shards
    from echoscene_tpu.data.fake import make_fake_dataset
    from echoscene_tpu.data.sgfront import SGFrontDataset
    from echoscene_tpu.data.collate import collate_scenes, CollateSpec
    from echoscene_tpu.models.sgdiff import SGDiff
    from echoscene_tpu.models.config import tiny_config
    import tempfile

    with tempfile.TemporaryDirectory() as root:
        make_fake_dataset(root, num_scenes=4, min_objs=3, max_objs=4,
                          sdf_res=16, with_sdf=True)
        ds = SGFrontDataset(root, use_sdf=True, with_changes=True, seed=5,
                            sdf_res=16)
        cfg = tiny_config()
        spec = CollateSpec(max_nodes=cfg.max_nodes,
                           max_triples=cfg.max_triples,
                           max_scenes=cfg.batch_scenes,
                           diffusion_bs=cfg.diffusion_bs, with_sdf=True,
                           sdf_res=16)
        batch = collate_scenes([ds[i] for i in range(3)], spec,
                               sdf_loader=ds.load_sdf)
        sg = SGDiff(cfg, num_objs=len(ds.classes), num_preds=len(ds.pred_names))
        state = sg.init(jax.random.PRNGKey(0), batch)

    n_dev = 4
    mesh = make_mesh((n_dev,), ("data",), jax.devices()[:n_dev])
    host_batch = jax.device_get(batch)
    stacked = stack_shards([host_batch] * n_dev)
    keys = [jax.random.PRNGKey(7), jax.random.PRNGKey(8)]

    dp_state = state
    dp_step = build_dp_train_step(sg, mesh)(dp_state)
    z_state = init_zero1_state(state, mesh)
    assert z_state.opt_state.mu.sharding.spec == P("data")
    shard_sz = z_state.opt_state.mu.addressable_shards[0].data.size
    assert shard_sz * n_dev >= ravel_pytree(state.params)[0].size
    z_step = build_zero1_train_step(sg, mesh)(z_state)

    for k in keys:
        rngs = jnp.stack([k] * n_dev)
        dp_state, dp_metrics = dp_step(dp_state, stacked, rngs)
        z_state, z_metrics = z_step(z_state, stacked, rngs)

    np.testing.assert_allclose(float(z_metrics["loss"]),
                               float(dp_metrics["loss"]), rtol=1e-5)
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_flatten_with_path(z_state.params)[0],
            jax.tree_util.tree_flatten_with_path(dp_state.params)[0]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5,
            err_msg=str([getattr(k, "key", "") for k in pa]))
    # VQ-VAE frozen: bit-equal to init
    for a, b in zip(jax.tree_util.tree_leaves(z_state.params["vqvae"]),
                    jax.tree_util.tree_leaves(state.params["vqvae"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(z_state.step) == 2 and int(z_state.opt_state.count) == 2


def _full_model_fixture(grad_accum=1, seed=5):
    """Tiny full model + one collated batch (shared by the slow tests)."""
    from echoscene_tpu.data.fake import make_fake_dataset
    from echoscene_tpu.data.sgfront import SGFrontDataset
    from echoscene_tpu.data.collate import collate_scenes, CollateSpec
    from echoscene_tpu.models.sgdiff import SGDiff
    from echoscene_tpu.models.config import tiny_config
    import tempfile

    with tempfile.TemporaryDirectory() as root:
        make_fake_dataset(root, num_scenes=4, min_objs=3, max_objs=4,
                          sdf_res=16, with_sdf=True)
        ds = SGFrontDataset(root, use_sdf=True, with_changes=True, seed=seed,
                            sdf_res=16)
        cfg = tiny_config()
        cfg.grad_accum = grad_accum
        spec = CollateSpec(max_nodes=cfg.max_nodes,
                           max_triples=cfg.max_triples,
                           max_scenes=cfg.batch_scenes,
                           diffusion_bs=cfg.diffusion_bs, with_sdf=True,
                           sdf_res=16)
        batch = collate_scenes([ds[i] for i in range(3)], spec,
                               sdf_loader=ds.load_sdf)
        sg = SGDiff(cfg, num_objs=len(ds.classes),
                    num_preds=len(ds.pred_names))
        state = sg.init(jax.random.PRNGKey(0), batch)
    return sg, state, batch


def _assert_params_close(got, want, atol=2e-5):
    for (pa, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(got)[0],
            jax.tree_util.tree_flatten_with_path(want)[0]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=atol,
            err_msg=str([getattr(k, "key", "") for k in pa]))


@pytest.mark.slow
def test_zero1_grad_accum_matches_dp_multisteps():
    """grad_accum=2 on the zero1 flat path == the dp MultiSteps path:
    4 microbatch calls (2 optimizer steps), identical params after."""
    from echoscene_tpu.parallel.dp import build_dp_train_step
    from echoscene_tpu.parallel.mesh import stack_shards

    sg, state, batch = _full_model_fixture(grad_accum=2)
    n_dev = 4
    mesh = make_mesh((n_dev,), ("data",), jax.devices()[:n_dev])
    stacked = stack_shards([jax.device_get(batch)] * n_dev)

    dp_state = state
    dp_step = build_dp_train_step(sg, mesh)(dp_state)
    z_state = init_zero1_state(state, mesh, grad_accum=2)
    assert z_state.opt_state.acc.size > 0
    z_step = build_zero1_train_step(sg, mesh)(z_state)

    for i in range(4):
        rngs = jnp.stack([jax.random.PRNGKey(100 + i)] * n_dev)
        dp_state, _ = dp_step(dp_state, stacked, rngs)
        z_state, _ = z_step(z_state, stacked, rngs)

    _assert_params_close(z_state.params, dp_state.params)
    # 4 microbatches -> 2 optimizer steps; accumulator drained
    assert int(z_state.opt_state.count) == 2
    assert int(z_state.opt_state.mini_step) == 0
    np.testing.assert_array_equal(np.asarray(z_state.opt_state.acc), 0.0)
    # mid-accumulation the params must NOT move
    z2 = init_zero1_state(state, mesh, grad_accum=2)
    z2_step = build_zero1_train_step(sg, mesh)(z2)
    z2, _ = z2_step(z2, stacked, jnp.stack([jax.random.PRNGKey(0)] * n_dev))
    _assert_params_close(z2.params, state.params, atol=0)
    assert int(z2.opt_state.mini_step) == 1


@pytest.mark.slow
def test_zero1_checkpoint_resume_matches_uninterrupted(tmp_path):
    """zero1: 2 steps -> save -> restore (via Trainer.load's _maybe_zero1
    template path) -> 2 more == 4 uninterrupted steps (VERDICT r4 next #3a)."""
    from echoscene_tpu.parallel.mesh import stack_shards
    from echoscene_tpu.train.checkpoint import save_checkpoint
    from echoscene_tpu.train.trainer import Trainer

    sg, state, batch = _full_model_fixture()
    n_dev = 4
    mesh = make_mesh((n_dev,), ("data",), jax.devices()[:n_dev])
    stacked = stack_shards([jax.device_get(batch)] * n_dev)
    keys = [jnp.stack([jax.random.PRNGKey(50 + i)] * n_dev) for i in range(4)]

    z0 = init_zero1_state(state, mesh)
    step = build_zero1_train_step(sg, mesh)(z0)

    # uninterrupted run
    ref = z0
    for k in keys:
        ref, _ = step(ref, stacked, k)

    # interrupted: 2 steps, save, restore through the Trainer path, 2 more
    half = z0
    for k in keys[:2]:
        half, _ = step(half, stacked, k)
    exp = str(tmp_path / "exp")
    trainer = Trainer.__new__(Trainer)       # avoid ctor IO; wire the fields
    trainer.sgdiff = sg
    trainer.zero1 = True
    trainer.dp_devices = n_dev
    trainer._mesh = mesh
    trainer.exp_dir = exp
    import os
    os.makedirs(os.path.join(exp, "checkpoint"), exist_ok=True)
    save_checkpoint(os.path.join(exp, "checkpoint", "model0"), half)
    resumed = trainer.load(state, 0)         # fresh optax template in
    from echoscene_tpu.parallel.zero import Zero1State
    assert isinstance(resumed.opt_state, Zero1State)
    assert resumed.opt_state.mu.sharding.spec == P("data")
    for k in keys[2:]:
        resumed, _ = step(resumed, stacked, k)

    _assert_params_close(resumed.params, ref.params, atol=1e-6)
    np.testing.assert_allclose(np.asarray(resumed.opt_state.mu),
                               np.asarray(ref.opt_state.mu), atol=1e-7)
    assert int(resumed.step) == int(ref.step) == 4


@pytest.mark.slow
def test_restore_for_inference_loads_zero1_checkpoint(tmp_path):
    """A --zero1 checkpoint (sharded Zero1State opt) restores into the
    replicated optax template via the params-only inference path
    (ADVICE r4 medium: eval/serve restores must not depend on how the
    run was optimized)."""
    from echoscene_tpu.parallel.mesh import stack_shards
    from echoscene_tpu.train.checkpoint import (save_checkpoint,
                                                restore_for_inference)

    sg, state, batch = _full_model_fixture()
    n_dev = 4
    mesh = make_mesh((n_dev,), ("data",), jax.devices()[:n_dev])
    stacked = stack_shards([jax.device_get(batch)] * n_dev)

    z = init_zero1_state(state, mesh)
    step = build_zero1_train_step(sg, mesh)(z)
    z, _ = step(z, stacked, jnp.stack([jax.random.PRNGKey(9)] * n_dev))
    path = str(tmp_path / "model3")
    save_checkpoint(path, z)

    got = restore_for_inference(path, state)   # optax-template state
    _assert_params_close(got.params, z.params, atol=0)
    assert int(got.step) == 1
    # opt_state keeps the template's (unused at inference)
    assert jax.tree_util.tree_structure(got.opt_state) \
        == jax.tree_util.tree_structure(state.opt_state)
