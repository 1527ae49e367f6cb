"""EchoLayout (layout-only) model family: train + sample without shape branch.

Reference: model/EchoLayout.py (Sg2BoxDiffModel) — the same GCN pipeline with
only the layout branch; exercised here via network_type='echolayout'.
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
from echoscene_tpu.models.sgdiff import SGDiff
from tests.test_end_to_end import tiny_config


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("el")
    make_fake_dataset(str(root), num_scenes=3, min_objs=3, max_objs=4,
                      sdf_res=16, with_sdf=False)
    ds = SGFrontDataset(str(root), use_sdf=False, with_changes=True, seed=1)
    cfg = tiny_config(network_type="echolayout")
    spec = CollateSpec(max_nodes=cfg.max_nodes, max_triples=cfg.max_triples,
                       max_scenes=cfg.batch_scenes, with_sdf=False)
    batch = collate_scenes([ds[i] for i in range(3)], spec)
    sg = SGDiff(cfg, num_objs=len(ds.classes), num_preds=len(ds.pred_names))
    state = sg.init(jax.random.PRNGKey(0), batch)
    return ds, batch, sg, state


def test_no_shape_branch_params(setup):
    _, _, sg, state = setup
    assert "shape_denoiser" not in state.params
    assert "vqvae" not in state.params
    assert "layout_denoiser" in state.params


def test_train_and_sample_boxes(setup):
    _, batch, sg, state = setup
    state2, metrics = sg.train_step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["shape_loss"]) == 0.0

    out = sg.sample_fn(state2.params, state2.batch_stats, batch,
                       jax.random.PRNGKey(2), gen_shape=False)
    assert "shapes" not in out
    assert out["sizes"].shape == (batch.num_nodes, 3)
    assert np.isfinite(np.asarray(out["translations"])).all()
