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


def test_transformers_backend_uses_projected_embedding():
    """The reference conditions on CLIP's PROJECTED text embedding
    (clip.encode_text = layernorm(EOS hidden) @ text_projection,
    dataset/threedfront_dataset.py:387,389).  The transformers backend must
    return CLIPTextModelWithProjection.text_embeds — NOT pooler_output."""
    import torch
    from transformers import CLIPTextConfig, CLIPTextModelWithProjection

    cfg = CLIPTextConfig(vocab_size=1000, hidden_size=32,
                         intermediate_size=64, num_hidden_layers=2,
                         num_attention_heads=4, max_position_embeddings=16,
                         projection_dim=512)
    torch.manual_seed(0)
    model = CLIPTextModelWithProjection(cfg).eval()

    class StubTok:   # deterministic token ids, no vocab files needed
        def __call__(self, texts, padding=True, return_tensors="pt"):
            ids = [[496, 10 + sum(map(ord, t)) % 900, 497] for t in texts]
            return {"input_ids": torch.tensor(ids)}

    enc = ClipTextEncoder("hash")       # construct hermetically...
    enc.backend = "transformers"        # ...then inject the tiny backend
    enc._hf = (StubTok(), model)
    got = enc.encode("bed")
    assert got.shape == (512,)
    with torch.no_grad():
        inputs = StubTok()(["bed"])
        tm = model.text_model(**inputs)
        projected = model.text_projection(tm.pooler_output)[0].numpy()
        pooled = tm.pooler_output[0].numpy()
    assert np.allclose(got, projected, atol=1e-5)
    n = min(got.shape[0], pooled.shape[0])
    assert not np.allclose(got[:n], pooled[:n], atol=1e-3)


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
