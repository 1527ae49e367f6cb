"""CLIP text-feature provider with three backends.

The reference treats CLIP features as cached inputs: it encodes class names /
relation phrases once with ViT-B/32 and pickles them per scan
(dataset/threedfront_dataset.py:352-403).  Network access is not assumed here,
so three backends exist:

  * 'cache'        — load the reference's per-scan pickle files verbatim
                     (CLIP_<scan>.pkl / CLIP_small_<scan>.pkl), or an .npz
                     phrase->vector table,
  * 'transformers' — local HuggingFace CLIP weights if present on disk,
  * 'hash'         — deterministic pseudo-features: each phrase maps to a
                     seeded N(0,1) 512-vector.  Distinct phrases get
                     near-orthogonal codes, identical phrases identical codes
                     — preserving the property the model actually consumes
                     (a stable per-phrase embedding), hermetically.

All backends return float32 (512,) vectors per phrase and are memoised.
"""
from __future__ import annotations

import hashlib
import os
import pickle
from typing import Dict, Optional

import numpy as np

CLIP_DIM = 512


class ClipTextEncoder:
    def __init__(self, backend: str = "hash", model_path: Optional[str] = None,
                 cache_table: Optional[str] = None):
        if backend == "auto":
            # installed real weights (scripts/fetch_weights.py) flip this to
            # the reference's true conditioning; hash proxy otherwise.
            # Callers that persist the backend (train/cli args.json) record
            # the RESOLVED name so later eval matches the training features.
            from ..weights import clip_text_dir
            d = clip_text_dir()
            backend, model_path = (("transformers", d) if d
                                   else ("hash", model_path))
        self.backend = backend
        self._memo: Dict[str, np.ndarray] = {}
        self._hf = None
        if backend == "transformers":
            # The reference conditions on OpenAI CLIP's PROJECTED text
            # embedding — clip.encode_text = layernorm(EOS hidden state)
            # @ text_projection (dataset/threedfront_dataset.py:387,389,686).
            # CLIPTextModelWithProjection.text_embeds reproduces exactly
            # that; plain CLIPTextModel.pooler_output would omit the
            # projection and silently produce different vectors.
            from transformers import (CLIPTextModelWithProjection,
                                      CLIPTokenizer)  # local weights only
            path = model_path or "openai/clip-vit-base-patch32"
            self._hf = (
                CLIPTokenizer.from_pretrained(path, local_files_only=True),
                CLIPTextModelWithProjection.from_pretrained(
                    path, local_files_only=True))
        elif backend == "cache" and cache_table and os.path.exists(cache_table):
            data = np.load(cache_table, allow_pickle=True)
            self._memo = {k: np.asarray(v, np.float32) for k, v in data.items()}

    def encode(self, text: str) -> np.ndarray:
        if text in self._memo:
            return self._memo[text]
        if self.backend == "transformers" and self._hf is not None:
            import torch
            tok, model = self._hf
            with torch.no_grad():
                inputs = tok([text], padding=True, return_tensors="pt")
                feat = model(**inputs).text_embeds[0].numpy().astype(np.float32)
        else:
            # hash backend (also the fallback for cache misses)
            seed = int.from_bytes(
                hashlib.sha256(text.encode()).digest()[:8], "little")
            feat = np.random.default_rng(seed).standard_normal(
                CLIP_DIM).astype(np.float32)
        self._memo[text] = feat
        return feat

    def encode_many(self, texts) -> np.ndarray:
        return np.stack([self.encode(t) for t in texts], axis=0)


def load_reference_pickle(path: str):
    """Load a reference-format per-scan CLIP pickle
    (threedfront_dataset.py:352-371)."""
    with open(path, "rb") as f:
        d = pickle.load(f)
    return d["instance_feats"], np.asarray(d["instance_order"]), d["rel_feats"]
