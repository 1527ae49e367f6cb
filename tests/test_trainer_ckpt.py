"""Trainer loop + Orbax checkpoint save/restore roundtrip."""
import os

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


def test_async_save_then_immediate_restore(setup, tmp_path):
    """wait=False returns before the Orbax write completes; a restore of the
    same path must first drain the in-flight save (checkpoint.py) — the
    hermetic train->eval sequence depends on this ordering."""
    _, _, sg, state = setup
    path = str(tmp_path / "ckpt_async")
    save_checkpoint(path, state, wait=False)
    restored = restore_checkpoint(path, state)
    a = jax.tree_util.tree_leaves(state.params)
    b = jax.tree_util.tree_leaves(restored.params)
    for x, y in zip(a, b):
        assert np.array_equal(np.asarray(x), np.asarray(y))
    # a second async save to another path drains the first (one in flight)
    save_checkpoint(str(tmp_path / "ckpt_async2"), state, wait=False)
    from echoscene_tpu.train.checkpoint import wait_for_checkpoints
    wait_for_checkpoints()
    restored2 = restore_checkpoint(str(tmp_path / "ckpt_async2"), state)
    assert int(restored2.step) == int(state.step)


def test_vq_ckpt_graft_into_joint_state(setup, tmp_path):
    """scripts/train_vqvae.py checkpoint -> frozen VQ subtree of the joint
    model (the reference's load_vqvae contract, model_utils.py:7-32)."""
    from echoscene_tpu.models.config import VQVAEConfig
    from echoscene_tpu.train.vqvae_trainer import VQVAETrainer
    from echoscene_tpu.train.checkpoint import load_vqvae_params

    ds, spec, sg, state = setup
    vq = sg.cfg.shape_branch.vqvae
    tr = VQVAETrainer(VQVAEConfig(
        embed_dim=vq.embed_dim, n_embed=vq.n_embed, z_channels=vq.z_channels,
        ch=vq.ch, ch_mult=tuple(vq.ch_mult),
        num_res_blocks=vq.num_res_blocks, resolution=vq.resolution))
    x = np.random.default_rng(0).normal(
        size=(2, vq.resolution, vq.resolution, vq.resolution, 1)
    ).astype(np.float32)
    vq_state = tr.init(jax.random.PRNGKey(9), x)
    vq_state, _ = tr.train_step(vq_state, x)
    ckpt = str(tmp_path / "vq-best")
    save_checkpoint(ckpt, vq_state)

    loaded = load_vqvae_params(ckpt, state.params["vqvae"])
    # grafted values equal the trained VQ state, not the joint init
    saved = jax.device_get(vq_state.params)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b)), loaded, saved)
    diffs = jax.tree.leaves(jax.tree.map(
        lambda a, b: float(np.max(np.abs(np.asarray(a) - np.asarray(b)))),
        loaded, jax.device_get(state.params["vqvae"])))
    assert max(diffs) > 1e-3  # actually replaced something
