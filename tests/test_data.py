"""Hermetic data-path tests: fake SG-FRONT fixture -> real reader -> collate."""
import numpy as np
import pytest

from echoscene_tpu.data.fake import make_fake_dataset
from echoscene_tpu.data.sgfront import SGFrontDataset
from echoscene_tpu.data.collate import collate_scenes, CollateSpec
from echoscene_tpu.data.clip_text import ClipTextEncoder


@pytest.fixture(scope="module")
def fake_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("sgfront")
    return make_fake_dataset(str(root), num_scenes=5, with_sdf=True, sdf_res=16)


def _ds(fake_root, **kw):
    defaults = dict(split="train_scans", room_type="bedroom", use_sdf=True,
                    use_scene_rels=True, with_changes=True, seed=7, sdf_res=16)
    defaults.update(kw)
    return SGFrontDataset(fake_root, **defaults)


def test_reader_basic(fake_root):
    ds = _ds(fake_root)
    assert len(ds) == 5
    ex = ds[0]
    assert ex is not None
    n, t = ex.num_nodes, len(ex.triples)
    assert ex.objs.shape == (n,) and ex.boxes.shape == (n, 7)
    assert ex.text_feats.shape == (n, 512)
    assert ex.rel_feats.shape == (t, 512)
    # root node is class 0 with box -1
    assert ex.objs[-1] == 0
    assert np.allclose(ex.boxes[-1], -1.0)
    # 'in' edges to the root exist
    assert (ex.triples[:, 1] == 0).any()
    # boxes (except root) are scaled into [-1, 1] for size/loc
    assert ex.boxes[:-1, :6].min() >= -1.01 and ex.boxes[:-1, :6].max() <= 1.01


def test_clip_hash_deterministic():
    enc1 = ClipTextEncoder("hash")
    enc2 = ClipTextEncoder("hash")
    a = enc1.encode("bed left table")
    b = enc2.encode("bed left table")
    c = enc2.encode("bed right table")
    assert np.allclose(a, b)
    assert not np.allclose(a, c)
    assert a.shape == (512,)


def test_manipulation_modes(fake_root):
    ds = _ds(fake_root)
    seen = set()
    for i in range(30):
        ex = ds[i % len(ds)]
        if ex is None:
            continue
        seen.add(ex.manipulation_type)
        if ex.manipulation_type == "addition":
            assert ex.enc_node_mask.sum() == ex.num_nodes - 1
            missing = int(np.where(ex.enc_node_mask == 0)[0][0])
            assert ex.change_flags[missing] == 1
            touching = ((ex.triples[:, 0] == missing) |
                        (ex.triples[:, 2] == missing))
            assert (ex.enc_triple_mask[touching] == 0).all()
        elif ex.manipulation_type == "relationship":
            diff = ex.enc_triples[:, 1] != ex.triples[:, 1]
            assert diff.sum() == 1
            idx = int(np.where(diff)[0][0])
            s, _, o = ex.triples[idx]
            assert ex.change_flags[s] == 1 and ex.change_flags[o] == 1
            # encoder-side CLIP feature recomputed for the faked phrase
            assert not np.allclose(ex.enc_rel_feats[idx], ex.rel_feats[idx])
    assert "none" in seen or len(seen) >= 2  # sampler produced variety


def test_eval_relationship_inverts_decoder(fake_root):
    ds = _ds(fake_root, split="test", eval_mode=True, eval_type="relationship",
             shuffle_objs=False)
    found = False
    for i in range(len(ds)):
        ex = ds[i]
        if ex is None:
            continue
        diff = ex.enc_triples[:, 1] != ex.triples[:, 1]
        assert diff.sum() == 1
        found = True
    assert found


def test_collate_invariants(fake_root):
    ds = _ds(fake_root)
    examples = [ds[i] for i in range(4)]
    spec = CollateSpec(max_nodes=40, max_triples=120, max_scenes=8,
                       diffusion_bs=16, with_sdf=True, sdf_res=16)
    batch = collate_scenes(examples, spec, sdf_loader=ds.load_sdf)
    assert batch is not None
    N, T = spec.max_nodes, spec.max_triples
    assert batch.dec.objs.shape == (N,)
    assert batch.dec.triples.shape == (T, 3)
    n_real = int(batch.dec.obj_mask.sum())
    # scene-major contiguous packing: padding strictly at the tail
    assert (batch.dec.obj_mask[:n_real] == 1).all()
    assert (batch.dec.obj_mask[n_real:] == 0).all()
    # triples reference valid flat node ids
    tm = batch.dec.triple_mask.astype(bool)
    assert batch.dec.triples[tm, 0].max() < n_real
    assert batch.dec.triples[tm, 2].max() < n_real
    # obj_to_scene: pads map to the ghost scene (max_scenes)
    assert (batch.obj_to_scene[n_real:] == spec.max_scenes).all()
    # shape prefix: whole scenes only
    nv = int(batch.shapes.num_valid)
    assert 0 < nv <= spec.diffusion_bs
    assert batch.shapes.sdf.shape == (16, 16, 16, 16, 1)
    scene_of_last = batch.obj_to_scene[nv - 1]
    if nv < n_real:
        assert batch.obj_to_scene[nv] != scene_of_last  # cut at scene boundary


@pytest.mark.parametrize("mode", ["random", "balance"])
def test_collate_nongreedy_shape_sampling(fake_root, mode):
    """select_sdfs random/balance parity (EchoScene.py:255-289): per-scene
    non-floor picks, indices into flat node slots, no triples for the shape
    denoiser."""
    ds = _ds(fake_root)
    examples = [ds[i] for i in range(3)]
    spec = CollateSpec(max_nodes=40, max_triples=120, max_scenes=8,
                       diffusion_bs=6, with_sdf=True, sdf_res=16,
                       shape_sampling=mode)
    rng = np.random.default_rng(3)
    batch = collate_scenes(examples, spec, sdf_loader=ds.load_sdf, rng=rng)
    sh = batch.shapes
    assert not sh.mp_valid
    nv = int(sh.num_valid)
    assert 0 < nv <= spec.diffusion_bs
    idx = np.asarray(sh.indices)[:nv]
    # selected rows are real non-scene nodes (floor/_scene_ have no sdf path)
    all_paths = []
    for e in examples:
        all_paths.extend(e.sdf_paths)
    assert all(all_paths[i] is not None for i in idx)
    # loaded grids match the selected nodes' SDFs
    for slot in range(min(nv, 3)):
        expect = ds.load_sdf(all_paths[idx[slot]])
        np.testing.assert_allclose(np.asarray(sh.sdf[slot]), expect)
    if mode == "balance":
        # per-scene picks cover distinct fine-grained cats when possible
        grained = np.concatenate([e.objs_grained for e in examples])
        per_scene = {}
        obj_to_scene = np.asarray(batch.obj_to_scene)
        for i in idx:
            per_scene.setdefault(int(obj_to_scene[i]), []).append(
                int(grained[i]))
        for cats in per_scene.values():
            assert len(set(cats)) >= min(len(cats), 2) or len(cats) == 1


@pytest.mark.slow  # full dual-branch loss compile (~65 s on the 1-core image)
def test_train_forward_nongreedy_runs(fake_root):
    """End-to-end loss with random shape sampling + message passing off."""
    import jax
    from echoscene_tpu.models.sgdiff import SGDiff
    from tests.test_end_to_end import tiny_config

    ds = _ds(fake_root)
    cfg = tiny_config()
    cfg.shape_branch.sampling = "random"
    cfg.shape_branch.denoiser.message_passing = False
    spec = CollateSpec(max_nodes=cfg.max_nodes, max_triples=cfg.max_triples,
                       max_scenes=cfg.batch_scenes,
                       diffusion_bs=cfg.diffusion_bs, with_sdf=True,
                       sdf_res=16, shape_sampling="random")
    batch = collate_scenes([ds[i] for i in range(3)], spec,
                           sdf_loader=ds.load_sdf,
                           rng=np.random.default_rng(0))
    sg = SGDiff(cfg, num_objs=len(ds.classes), num_preds=len(ds.pred_names))
    state = sg.init(jax.random.PRNGKey(0), batch)
    loss, (_, metrics) = jax.jit(sg.loss_fn)(
        state.params, state.batch_stats, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    assert float(metrics["shape_loss"]) > 0


def test_collate_scene_overflow_drops(fake_root):
    ds = _ds(fake_root)
    examples = [ds[i] for i in range(5)]
    spec = CollateSpec(max_nodes=10, max_triples=40, max_scenes=8,
                       diffusion_bs=8, with_sdf=False)
    batch = collate_scenes(examples, spec)
    assert batch is not None
    assert batch.dec.obj_mask.sum() <= 10


def test_bin_angle_dataset_and_decode(tmp_path):
    """--bin_angle surface parity: 24-bin digitised angles + mean/std box
    standardisation at the dataset (threedfront_dataset.py:300-304 +
    train_3dfront.py:230-233 clamp) and the legacy eval decode
    (eval_3dfront.py:158)."""
    import numpy as np
    from echoscene_tpu.data.fake import make_fake_dataset
    from echoscene_tpu.data.sgfront import SGFrontDataset
    from echoscene_tpu.core.boxes import (bin_angles_to_degrees,
                                          digitize_angle)

    root = str(tmp_path / "data")
    make_fake_dataset(root, num_scenes=2, min_objs=3, max_objs=4, sdf_res=16)
    ds = SGFrontDataset(root, use_sdf=False, with_changes=False, seed=0,
                        bin_angle=True)
    ex = ds[0]
    angles = ex.boxes[:-1, 6]       # exclude the _scene_ root sentinel box
    assert np.all(angles == np.round(angles))        # integral bin ids
    assert np.all((angles >= 0) & (angles < 24))     # clamped range
    assert ds.box_stats_msd.shape[0] == 2

    assert digitize_angle(0.0) == 12.0               # mid-range bin
    assert digitize_angle(100.0) == 0.0              # out of range -> clamp
    deg = bin_angles_to_degrees(np.eye(24, dtype=np.float32))
    assert deg.shape == (24, 1)
    assert deg[0, 0] == -165.0 and deg[23, 0] == 180.0
