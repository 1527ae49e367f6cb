"""Multi-device tests on the 8-device virtual CPU mesh: dp train step,
tensor-parallel param shardings, and the driver's dryrun entry."""
import numpy as np
import jax
import pytest
# Full-model jit compiles make this module multi-minute on one CPU
# core; excluded from the fast default selection (pytest.ini addopts).
pytestmark = pytest.mark.slow


from echoscene_tpu.parallel.mesh import make_mesh, stack_shards
from echoscene_tpu.parallel.dp import (build_dp_sample, build_dp_train_step,
                                       shard_params_for_model_parallel)


@pytest.fixture(scope="module")
def tiny_setup(tmp_path_factory):
    from echoscene_tpu.data.fake import make_fake_dataset
    from echoscene_tpu.data.sgfront import SGFrontDataset
    from echoscene_tpu.data.collate import collate_scenes, CollateSpec
    from echoscene_tpu.models.sgdiff import SGDiff
    from tests.test_end_to_end import tiny_config

    root = tmp_path_factory.mktemp("par")
    make_fake_dataset(str(root), num_scenes=4, min_objs=3, max_objs=4,
                      sdf_res=16, with_sdf=True)
    ds = SGFrontDataset(str(root), use_sdf=True, with_changes=True, seed=5,
                        sdf_res=16)
    cfg = tiny_config()
    spec = CollateSpec(max_nodes=cfg.max_nodes, max_triples=cfg.max_triples,
                       max_scenes=cfg.batch_scenes,
                       diffusion_bs=cfg.diffusion_bs, with_sdf=True,
                       sdf_res=16)
    batch = collate_scenes([ds[i] for i in range(3)], spec,
                           sdf_loader=ds.load_sdf)
    sg = SGDiff(cfg, num_objs=len(ds.classes), num_preds=len(ds.pred_names))
    state = sg.init(jax.random.PRNGKey(0), batch)
    return sg, state, batch, ds, spec


def test_eight_cpu_devices_present():
    assert len(jax.devices()) == 8


def test_dp_train_step_matches_single_device(tiny_setup):
    """Identical per-shard batches + pmean == the single-device step."""
    sg, state, batch, _, _ = tiny_setup
    n_dev = 4
    mesh = make_mesh((n_dev,), ("data",), jax.devices()[:n_dev])
    host_batch = jax.device_get(batch)
    stacked = stack_shards([host_batch] * n_dev)
    rng = jax.random.PRNGKey(7)
    rngs = jax.numpy.stack([rng] * n_dev)   # same key on every shard

    step = build_dp_train_step(sg, mesh)(state)
    new_state, metrics = step(state, stacked, rngs)
    assert np.isfinite(float(metrics["loss"]))

    ref_state, ref_metrics = sg.train_step(state, batch, rng)
    assert np.allclose(float(metrics["loss"]), float(ref_metrics["loss"]),
                       rtol=1e-4)
    # params agree (same grads everywhere -> pmean is identity)
    diffs = jax.tree_util.tree_leaves(jax.tree.map(
        lambda a, b: float(np.max(np.abs(np.asarray(a) - np.asarray(b)))),
        new_state.params["layout_denoiser"],
        ref_state.params["layout_denoiser"]))
    assert max(diffs) < 1e-4


def test_dp_sample_matches_single_device(tiny_setup):
    """Sampling is embarrassingly parallel: identical shards + identical keys
    must reproduce the single-device sample bit-for-bit on every shard."""
    sg, state, batch, _, _ = tiny_setup
    n_dev = 2
    mesh = make_mesh((n_dev,), ("data",), jax.devices()[:n_dev])
    host_batch = jax.device_get(batch)
    stacked = stack_shards([host_batch] * n_dev)
    rng = jax.random.PRNGKey(11)
    rngs = jax.numpy.stack([rng] * n_dev)

    sample = build_dp_sample(sg, mesh, gen_shape=True)
    out = sample(state.params, state.batch_stats, stacked, rngs)
    ref = jax.jit(lambda p, bs, b, k: sg.sample_fn(p, bs, b, k, gen_shape=True))(
        state.params, state.batch_stats, batch, rng)

    for key in ("sizes", "translations", "angles", "shapes"):
        got = np.asarray(out[key])
        want = np.asarray(ref[key])
        assert got.shape == (n_dev,) + want.shape, (key, got.shape)
        for d in range(n_dev):
            np.testing.assert_allclose(got[d], want, atol=1e-5, err_msg=key)


def test_evaluator_dp_scores_all_scenes(tiny_setup, tmp_path):
    """SceneEvaluator with dp_devices=2 scores the same scene count as the
    single-device path (odd scene count exercises the padded final flush)."""
    from echoscene_tpu.eval.evaluator import SceneEvaluator

    sg, state, _, ds, spec = tiny_setup

    def run(dp, sub):
        ev = SceneEvaluator(sg, state, spec, ds.box_stats, gen_shape=False,
                            store_path=str(tmp_path / sub), eval_batch=1,
                            dp_devices=dp)
        acc, _, _ = ev.run(ds, "none", 3, jax.random.PRNGKey(5))
        return acc

    acc_dp = run(2, "dp")
    acc_1 = run(1, "single")
    assert len(acc_dp["total"]) == len(acc_1["total"]) > 0
    assert (tmp_path / "dp" / "none_accuracy_analysis.txt").exists()


def test_model_parallel_sharding_placement(tiny_setup):
    sg, state, _, _, _ = tiny_setup
    mesh = make_mesh((2, 2), ("data", "model"), jax.devices()[:4])
    sharded = shard_params_for_model_parallel(state.params, mesh)
    # attention qkv kernels column-shard; ResBlock conv pairs column/row-shard
    flat = jax.tree_util.tree_flatten_with_path(sharded)[0]
    found_attn = found_c0 = found_c1 = 0
    P = jax.sharding.PartitionSpec
    for path, leaf in flat:
        keys = [getattr(k, "key", "") for k in path]
        if "shape_denoiser" not in keys or keys[-1] != "kernel":
            continue
        gparent = keys[-3] if len(keys) > 2 else ""
        in_res = gparent.endswith("_res") or gparent.startswith("mid_res")
        if keys[-2] in ("to_q", "to_k", "to_v"):
            assert leaf.sharding.spec == P(None, "model"), keys
            found_attn += 1
        elif in_res and keys[-2] == "Conv_0" and leaf.shape[-1] % 2 == 0:
            assert leaf.sharding.spec == P(None, None, None, None, "model"), keys
            found_c0 += 1
        elif in_res and keys[-2] == "Conv_1" and leaf.shape[-2] % 2 == 0:
            assert leaf.sharding.spec == P(None, None, None, "model", None), keys
            found_c1 += 1
    assert found_attn > 0 and found_c0 > 0 and found_c1 > 0, (
        found_attn, found_c0, found_c1)


def test_tp_sharded_sampling_matches_single_device(tiny_setup):
    """A tp=2 GSPMD sampling run (conv kernels channel-sharded on 'model')
    must match the unsharded single-device sample — the sharding is a layout
    annotation, never a semantic change."""
    from echoscene_tpu.parallel.dp import build_dp_tp_sample
    from echoscene_tpu.parallel.mesh import shard_stacked

    sg, state, batch, _, _ = tiny_setup
    mesh = make_mesh((1, 2), ("data", "model"), jax.devices()[:2])
    sharded_params = shard_params_for_model_parallel(state.params, mesh)
    host_batch = jax.device_get(batch)
    stacked = shard_stacked(stack_shards([host_batch]), mesh)
    rng = jax.random.PRNGKey(3)
    rngs = shard_stacked(np.stack([np.asarray(rng)]), mesh)

    sample = build_dp_tp_sample(sg, mesh, gen_shape=True)
    out = sample(sharded_params, state.batch_stats, stacked, rngs)
    ref = jax.jit(lambda p, bs, b, k: sg.sample_fn(p, bs, b, k, gen_shape=True))(
        state.params, state.batch_stats, batch, rng)
    for key in ("sizes", "translations", "angles", "shapes"):
        got = np.asarray(out[key])[0]
        want = np.asarray(ref[key])
        np.testing.assert_allclose(got, want, atol=2e-4, err_msg=key)


def test_graft_dryrun_multichip():
    import sys
    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import dryrun_multichip
    dryrun_multichip(8)
