"""Latent-cache path: collate ships precomputed VQ latents instead of SDFs."""
import numpy as np

from echoscene_tpu.data.fake import make_fake_dataset
from echoscene_tpu.data.sgfront import SGFrontDataset
from echoscene_tpu.data.collate import collate_scenes, CollateSpec


def test_collate_with_latent_lookup(tmp_path):
    root = str(tmp_path / "d")
    make_fake_dataset(root, num_scenes=3, min_objs=3, max_objs=4, sdf_res=16)
    ds = SGFrontDataset(root, use_sdf=True, with_changes=False, seed=0,
                        sdf_res=16)
    spec = CollateSpec(max_nodes=24, max_triples=64, max_scenes=4,
                       diffusion_bs=10, with_sdf=True, sdf_res=16,
                       latent_res=4, latent_ch=3)

    zero_latent = np.full((4, 4, 4, 3), 7.0, np.float32)

    def lookup(path):
        if path is None:
            return zero_latent
        # deterministic per-path pattern
        seed = abs(hash(path)) % 1000
        return np.full((4, 4, 4, 3), float(seed), np.float32)

    batch = collate_scenes([ds[i] for i in range(2)], spec,
                           latent_lookup=lookup)
    assert batch.shapes.sdf is None
    assert batch.shapes.latent.shape == (10, 4, 4, 4, 3)
    nv = int(batch.shapes.num_valid)
    assert nv > 0
    # valid slots filled, tail zero
    assert (batch.shapes.latent[nv:] == 0).all()
    assert not (batch.shapes.latent[:nv] == 0).all()


def test_sdf_lru_cache(tmp_path):
    root = str(tmp_path / "d2")
    make_fake_dataset(root, num_scenes=2, min_objs=3, max_objs=3, sdf_res=16)
    ds = SGFrontDataset(root, use_sdf=True, with_changes=False, seed=0,
                        sdf_res=16)
    ex = ds[0]
    paths = [p for p in ex.sdf_paths if p]
    a = ds.load_sdf(paths[0])
    b = ds.load_sdf(paths[0])
    assert a is b  # cached object identity
