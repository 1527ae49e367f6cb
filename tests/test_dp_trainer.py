"""Data-parallel Trainer path on the virtual CPU mesh."""
import numpy as np
import jax
import pytest
# Full-model jit compiles make this module multi-minute on one CPU
# core; excluded from the fast default selection (pytest.ini addopts).
pytestmark = pytest.mark.slow


from echoscene_tpu.data.fake import make_fake_dataset
from echoscene_tpu.data.sgfront import SGFrontDataset
from echoscene_tpu.data.collate import CollateSpec
from echoscene_tpu.models.sgdiff import SGDiff
from echoscene_tpu.train.trainer import Trainer, batch_iterator
from tests.test_end_to_end import tiny_config


def test_trainer_dp_runs(tmp_path):
    root = tmp_path / "data"
    make_fake_dataset(str(root), num_scenes=6, min_objs=3, max_objs=4,
                      sdf_res=16, with_sdf=True)
    ds = SGFrontDataset(str(root), use_sdf=True, with_changes=True, seed=4,
                        sdf_res=16)
    cfg = tiny_config()
    spec = CollateSpec(max_nodes=cfg.max_nodes, max_triples=cfg.max_triples,
                       max_scenes=cfg.batch_scenes,
                       diffusion_bs=cfg.diffusion_bs, with_sdf=True,
                       sdf_res=16)
    sg = SGDiff(cfg, num_objs=len(ds.classes), num_preds=len(ds.pred_names))
    first = next(batch_iterator(ds, spec, 3, np.random.default_rng(0)))
    state = sg.init(jax.random.PRNGKey(0), first)

    trainer = Trainer(sg, ds, spec, str(tmp_path / "exp"), batch_scenes=3,
                      log_every=1, dp_devices=2)
    out = trainer.train(state, epochs=1, max_steps=1)
    # one dp step consumed 2 shard batches -> step advanced once
    assert int(out.step) == 1
