"""Trainer loop + Orbax checkpoint save/restore roundtrip."""
import os

import numpy as np
import jax
import pytest

from echoscene_tpu.data.fake import make_fake_dataset
from echoscene_tpu.data.sgfront import SGFrontDataset
from echoscene_tpu.data.collate import CollateSpec
from echoscene_tpu.models.sgdiff import SGDiff
from echoscene_tpu.train.trainer import Trainer, dump_args, batch_iterator
from echoscene_tpu.train.checkpoint import (save_checkpoint,
                                            restore_checkpoint, latest_epoch)
from tests.test_end_to_end import tiny_config


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("tr")
    make_fake_dataset(str(root), num_scenes=4, min_objs=3, max_objs=4,
                      sdf_res=16, with_sdf=True)
    ds = SGFrontDataset(str(root), use_sdf=True, with_changes=True, seed=2,
                        sdf_res=16)
    cfg = tiny_config()
    spec = CollateSpec(max_nodes=cfg.max_nodes, max_triples=cfg.max_triples,
                       max_scenes=cfg.batch_scenes,
                       diffusion_bs=cfg.diffusion_bs, with_sdf=True,
                       sdf_res=16)
    sg = SGDiff(cfg, num_objs=len(ds.classes), num_preds=len(ds.pred_names))
    first = next(batch_iterator(ds, spec, 3, np.random.default_rng(0)))
    state = sg.init(jax.random.PRNGKey(0), first)
    return ds, spec, sg, state


def test_trainer_runs_steps_and_saves(setup, tmp_path):
    ds, spec, sg, state = setup
    # the trainer donates its input state's buffers; keep the fixture's copy
    state = jax.tree.map(lambda x: x.copy() if hasattr(x, "copy") else x, state)
    exp = str(tmp_path / "exp")
    trainer = Trainer(sg, ds, spec, exp, batch_scenes=3, log_every=1,
                      ckpt_every_epochs=1)
    out_state = trainer.train(state, epochs=1, max_steps=2)
    assert int(out_state.step) == 2
    assert latest_epoch(exp) >= 0
    assert os.path.exists(os.path.join(exp, "loss_log.txt"))

    dump_args(exp, {"network_type": "echoscene"})
    assert os.path.exists(os.path.join(exp, "args.json"))


def test_checkpoint_roundtrip(setup, tmp_path):
    _, _, sg, state = setup
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, state)
    # perturb then restore
    zeroed = state.replace(
        params=jax.tree.map(lambda x: x * 0, state.params),
        step=state.step + 123)
    restored = restore_checkpoint(path, zeroed)
    assert int(restored.step) == int(state.step)
    a = jax.tree_util.tree_leaves(state.params)
    b = jax.tree_util.tree_leaves(restored.params)
    for x, y in zip(a, b):
        assert np.array_equal(np.asarray(x), np.asarray(y))
