"""End-to-end slice: fake dataset -> collate -> init -> train steps -> sample.

This is the hermetic integration test the reference never had (SURVEY.md §4):
the full EchoScene path (dual branch, echo GCNs, VQ encode, both samplers) on
tiny shapes, CPU.
"""
import numpy as np
import jax
import pytest
# Full-model jit compiles make this module multi-minute on one CPU
# core; excluded from the fast default selection (pytest.ini addopts).
pytestmark = pytest.mark.slow


from echoscene_tpu.data.fake import make_fake_dataset
from echoscene_tpu.data.sgfront import SGFrontDataset
from echoscene_tpu.data.collate import collate_scenes, CollateSpec
from echoscene_tpu.models.config import EchoSceneConfig, tiny_config  # noqa: F401
# (tiny_config now lives in models.config; re-exported here because several
# test modules import it from this module)
from echoscene_tpu.models.sgdiff import SGDiff


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    make_fake_dataset(str(root), num_scenes=4, min_objs=3, max_objs=4,
                      sdf_res=16, with_sdf=True)
    ds = SGFrontDataset(str(root), use_sdf=True, with_changes=True, seed=3,
                        sdf_res=16)
    cfg = tiny_config()
    spec = CollateSpec(max_nodes=cfg.max_nodes, max_triples=cfg.max_triples,
                       max_scenes=cfg.batch_scenes,
                       diffusion_bs=cfg.diffusion_bs, with_sdf=True,
                       sdf_res=16)
    batch = collate_scenes([ds[i] for i in range(3)], spec,
                           sdf_loader=ds.load_sdf)
    sg = SGDiff(cfg, num_objs=len(ds.classes), num_preds=len(ds.pred_names),
                iou_stats=ds.box_stats)
    state = sg.init(jax.random.PRNGKey(0), batch)
    return ds, spec, batch, sg, state


def test_init_param_structure(setup):
    _, _, _, sg, state = setup
    top = set(state.params.keys())
    assert {"obj_embeddings_ec", "pred_embeddings_ec", "gconv_net_ec",
            "gconv_net_manipulation", "rel_s_mlp", "layout_denoiser",
            "shape_denoiser", "vqvae"} <= top


def test_train_step_decreases_nan_free(setup):
    _, _, batch, sg, state = setup
    losses = []
    for i in range(3):
        state, metrics = sg.train_step(state, batch, jax.random.PRNGKey(i))
        loss = float(metrics["loss"])
        assert np.isfinite(loss)
        losses.append(loss)
    assert int(state.step) == 3
    for k in ["loss.size", "loss.trans", "loss.angle", "loss_simple"]:
        assert np.isfinite(float(metrics[k]))


def test_vqvae_frozen_under_training(setup):
    _, _, batch, sg, state = setup
    before = jax.tree.map(np.asarray, state.params["vqvae"])
    state2, _ = sg.train_step(state, batch, jax.random.PRNGKey(9))
    after = jax.tree.map(np.asarray, state2.params["vqvae"])
    flat_b = jax.tree_util.tree_leaves(before)
    flat_a = jax.tree_util.tree_leaves(after)
    for b, a in zip(flat_b, flat_a):
        assert np.array_equal(b, a)
    # but the trainable parts moved
    moved = jax.tree_util.tree_leaves(jax.tree.map(
        lambda x, y: float(np.abs(np.asarray(x) - np.asarray(y)).max()),
        state.params["layout_denoiser"], state2.params["layout_denoiser"]))
    assert max(moved) > 0


def test_sample_full_pipeline(setup):
    _, _, batch, sg, state = setup
    out = sg.sample_fn(state.params, state.batch_stats, batch,
                       jax.random.PRNGKey(0), gen_shape=True)
    n = batch.num_nodes
    assert out["sizes"].shape == (n, 3)
    assert out["translations"].shape == (n, 3)
    assert out["angles"].shape == (n, 1)
    assert np.isfinite(np.asarray(out["sizes"])).all()
    shapes = np.asarray(out["shapes"])
    assert shapes.shape == (n, 16, 16, 16, 1)
    assert np.isfinite(shapes).all()


def test_compacted_shape_sampling_matches_full(setup):
    """shape_rows compaction (sample_fn) must reproduce the full-width chain
    exactly on the real rows — padded slots are masked out of the echo GCN,
    per-object attention never crosses rows, and the shared initial noise is
    a broadcast single draw, so only dead FLOPs are removed."""
    from echoscene_tpu.models.sgdiff import shape_row_capacity
    _, _, batch, sg, state = setup
    full = sg.sample_fn(state.params, state.batch_stats, batch,
                        jax.random.PRNGKey(5), gen_shape=True)
    rows = shape_row_capacity(batch, multiple=4)
    assert rows < batch.num_nodes, "fixture must leave padded tail slots"
    comp = sg.sample_fn(state.params, state.batch_stats, batch,
                        jax.random.PRNGKey(5), gen_shape=True,
                        shape_rows=rows)
    real = int(np.asarray(batch.dec.obj_mask).sum())
    for k in ("sizes", "translations", "angles"):
        # layout chain is also compacted now: real rows must be bit-level
        # reproduced (noise is drawn at full width and sliced), the dropped
        # tail is zeros
        np.testing.assert_allclose(np.asarray(full[k])[:real],
                                   np.asarray(comp[k])[:real], atol=1e-5)
        assert np.all(np.asarray(comp[k])[rows:] == 0)
    np.testing.assert_allclose(np.asarray(full["shapes"])[:real],
                               np.asarray(comp["shapes"])[:real], atol=2e-4)
    # dropped tail is zeros
    assert np.all(np.asarray(comp["shapes"])[rows:] == 0)


def test_sample_with_manipulation_keep_mask(setup):
    ds, spec, _, sg, state = setup
    ds.eval_mode = True
    ds.eval_type = "relationship"
    ex = None
    for i in range(len(ds)):
        ex = ds[i]
        if ex is not None and ex.manipulation_type == "relationship":
            break
    if ex is None or ex.manipulation_type != "relationship":
        pytest.skip("no relationship-manipulable scene in fixture")
    batch = collate_scenes([ex], spec, sdf_loader=ds.load_sdf)
    out = sg.sample_fn(state.params, state.batch_stats, batch,
                       jax.random.PRNGKey(1), gen_shape=False,
                       with_manipulation=True)
    keep = np.asarray(out["keep"])
    assert (keep == 1 - np.asarray(batch.change_flags)).all()
    ds.eval_mode = False


def test_latent_batch_loss_matches_sdf(setup):
    """Precomputed-latent training (scripts/precompute_latents.py,
    --latent_cache): feeding encode_sdf's output as shapes.latent must
    reproduce the SDF path's loss to float rounding — the frozen encode is
    deterministic, so caching it is a pure compute-motion optimization."""
    from echoscene_tpu.benchmarks import to_latent_batch

    _, _, batch, sg, state = setup
    lb = to_latent_batch(sg, state, batch)
    assert lb.shapes.sdf is None and lb.shapes.latent is not None
    rng = jax.random.PRNGKey(5)
    l_sdf, (_, m_sdf) = jax.jit(sg.loss_fn)(state.params, state.batch_stats,
                                            batch, rng)
    l_lat, (_, m_lat) = jax.jit(sg.loss_fn)(state.params, state.batch_stats,
                                            lb, rng)
    np.testing.assert_allclose(float(l_lat), float(l_sdf), rtol=1e-5)
    np.testing.assert_allclose(float(m_lat["shape_loss"]),
                               float(m_sdf["shape_loss"]), rtol=1e-5)
