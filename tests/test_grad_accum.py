"""Gradient accumulation (optax.MultiSteps wrapping): k microbatches per
optimizer step must (a) freeze params on non-final microsteps and (b) apply
the MEAN of the accumulated grads — so k identical microbatches reproduce the
plain single-step update exactly.

Restores the reference's effective batch 64 (config/full_mp.yaml:2) within
one chip's HBM via --batchSize B --grad_accum k.
"""
import numpy as np
import jax
import pytest

# full-model jit; excluded from the fast default selection
pytestmark = pytest.mark.slow

from echoscene_tpu.data.fake import make_fake_dataset
from echoscene_tpu.data.sgfront import SGFrontDataset
from echoscene_tpu.data.collate import CollateSpec
from echoscene_tpu.models.sgdiff import SGDiff
from echoscene_tpu.models.config import tiny_config
from echoscene_tpu.train.trainer import batch_iterator


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("ga")
    make_fake_dataset(str(root), num_scenes=4, min_objs=3, max_objs=4,
                      sdf_res=16, with_sdf=False)
    ds = SGFrontDataset(str(root), use_sdf=False, with_changes=True, seed=2,
                        sdf_res=16)
    cfg = tiny_config("echolayout")
    spec = CollateSpec(max_nodes=cfg.max_nodes, max_triples=cfg.max_triples,
                       max_scenes=cfg.batch_scenes,
                       diffusion_bs=cfg.diffusion_bs, with_sdf=False)
    batch = next(batch_iterator(ds, spec, 3, np.random.default_rng(0)))
    return ds, cfg, batch


def _trainable_leaves(params):
    # everything except the frozen vqvae subtree (absent for echolayout)
    return [x for k, x in params.items() if k != "vqvae"]


def test_accum_matches_single_step(setup):
    ds, cfg0, batch = setup
    key = jax.random.PRNGKey(7)

    def build(accum):
        cfg = tiny_config("echolayout")
        cfg.grad_accum = accum
        sg = SGDiff(cfg, num_objs=len(ds.classes),
                    num_preds=len(ds.pred_names))
        state = sg.init(jax.random.PRNGKey(0), batch)
        return sg, state

    sg1, state1 = build(1)
    sg2, state2 = build(2)
    # identical init (same rng, same batch)
    jax.tree.map(np.testing.assert_allclose, state1.params, state2.params)

    ref_state, _ = sg1.train_step(state1, batch, key)

    mid_state, _ = sg2.train_step(state2, batch, key)
    # microstep 1 of 2: params must be UNCHANGED (update deferred)
    for a, b in zip(jax.tree.leaves(state2.params),
                    jax.tree.leaves(mid_state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    fin_state, _ = sg2.train_step(mid_state, batch, key)
    # mean of two identical grads == the grad -> exactly the accum=1 update
    for a, b in zip(jax.tree.leaves(ref_state.params),
                    jax.tree.leaves(fin_state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=1e-7)
    assert int(fin_state.step) == 2


def test_lr_log_counts_optimizer_steps(setup, tmp_path):
    """Trainer.current_lr advances the schedule per optimizer step, not per
    microbatch, under accumulation."""
    from echoscene_tpu.train.trainer import Trainer
    ds, _, batch = setup
    cfg = tiny_config("echolayout")
    cfg.grad_accum = 4
    cfg.lr_step = (2,)          # drop after 2 OPTIMIZER steps
    cfg.lr_evo = (5e-5,)
    sg = SGDiff(cfg, num_objs=len(ds.classes), num_preds=len(ds.pred_names))
    spec = CollateSpec(max_nodes=cfg.max_nodes, max_triples=cfg.max_triples,
                       max_scenes=cfg.batch_scenes,
                       diffusion_bs=cfg.diffusion_bs, with_sdf=False)
    tr = Trainer(sg, ds, spec, str(tmp_path / "exp"), batch_scenes=3)
    assert tr.current_lr(7) == cfg.lr_init      # 7 microsteps = 1 opt step
    assert tr.current_lr(8) == 5e-5             # 8 microsteps = 2 opt steps
