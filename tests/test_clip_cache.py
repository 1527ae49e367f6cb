"""CLIP cache backend: reference-format pickle loading."""
import os
import pickle

import numpy as np

from echoscene_tpu.data.clip_text import (ClipTextEncoder,
                                          load_reference_pickle, CLIP_DIM)


def test_reference_pickle_roundtrip(tmp_path):
    feats = np.random.default_rng(0).normal(size=(3, 512)).astype(np.float32)
    d = {
        "instance_feats": feats,
        "instance_order": [4, 7, 2],
        "rel_feats": {"bed left table": feats[0]},
    }
    p = tmp_path / "CLIP_scene.pkl"
    with open(p, "wb") as f:
        pickle.dump(d, f)
    inst, order, rels = load_reference_pickle(str(p))
    assert np.allclose(inst, feats)
    assert list(order) == [4, 7, 2]
    assert "bed left table" in rels


def test_cache_table_backend(tmp_path):
    table = {"bed": np.ones(CLIP_DIM, np.float32),
             "table": np.full(CLIP_DIM, 2.0, np.float32)}
    p = str(tmp_path / "table.npz")
    np.savez(p, **table)
    enc = ClipTextEncoder("cache", cache_table=p)
    assert np.allclose(enc.encode("bed"), 1.0)
    assert np.allclose(enc.encode("table"), 2.0)
    # miss falls back to hash (deterministic)
    a = enc.encode("unknown phrase")
    b = ClipTextEncoder("hash").encode("unknown phrase")
    assert np.allclose(a, b)
