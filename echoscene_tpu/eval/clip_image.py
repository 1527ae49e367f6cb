"""CLIP image-feature provider for the consistency metric's --clip option.

Behavioral reference: scripts/consistency_check.py:63-75 — per same-object
pair, encode the two rendered per-object images with CLIP ViT-B/32 and
report the L2 distance between the (projected) image embeddings, averaged
per category.  Network access is not assumed here, so two backends exist
(mirroring data/clip_text.py):

  * 'transformers' — local HuggingFace CLIP vision weights
    (CLIPVisionModelWithProjection.image_embeds == clip.encode_image, the
    projected embedding the reference uses),
  * 'pixel'        — hermetic proxy: the image downsampled to 16x16x3 and
    L2-normalised, flattened to a 768-vector.  Pair DISTANCES under this
    proxy are not comparable to real-CLIP numbers (documented in the
    consistency CLI); it exists so the plumbing runs end-to-end without
    weights.
"""
from __future__ import annotations

from typing import Optional

import numpy as np


class ClipImageEncoder:
    def __init__(self, backend: str = "pixel",
                 model_path: Optional[str] = None):
        if backend == "auto":
            # installed ViT-B/32 snapshot (scripts/fetch_weights.py) carries
            # the vision tower too; pixel proxy otherwise
            from ..weights import clip_text_dir
            d = clip_text_dir()
            backend, model_path = (("transformers", d) if d
                                   else ("pixel", model_path))
        self.backend = backend
        self._hf = None
        if backend == "transformers":
            from transformers import (CLIPImageProcessor,
                                      CLIPVisionModelWithProjection)
            path = model_path or "openai/clip-vit-base-patch32"
            self._hf = (
                CLIPImageProcessor.from_pretrained(path,
                                                   local_files_only=True),
                CLIPVisionModelWithProjection.from_pretrained(
                    path, local_files_only=True))

    def encode(self, image: np.ndarray) -> np.ndarray:
        """image: (H, W, 3) uint8 or float in [0, 255] -> feature vector."""
        img = np.asarray(image)
        if img.ndim == 2:
            img = np.stack([img] * 3, -1)
        img = img[..., :3]
        if self.backend == "transformers" and self._hf is not None:
            import torch
            proc, model = self._hf
            with torch.no_grad():
                inputs = proc(images=img.astype(np.uint8),
                              return_tensors="pt")
                return model(**inputs).image_embeds[0].numpy().astype(
                    np.float32)
        # pixel proxy: area-downsample to 16x16 then L2-normalise
        h, w = img.shape[:2]
        th = tw = 16
        ys = (np.arange(th + 1) * h // th)
        xs = (np.arange(tw + 1) * w // tw)
        small = np.zeros((th, tw, 3), np.float32)
        for i in range(th):
            for j in range(tw):
                patch = img[ys[i]:max(ys[i + 1], ys[i] + 1),
                            xs[j]:max(xs[j + 1], xs[j] + 1)]
                small[i, j] = patch.reshape(-1, 3).mean(0)
        v = small.reshape(-1)
        n = np.linalg.norm(v)
        return (v / n if n > 0 else v).astype(np.float32)


def pair_clip_distance(enc: ClipImageEncoder, img_a: np.ndarray,
                       img_b: np.ndarray) -> float:
    """torch.norm(f_a - f_b) of the pair's features
    (consistency_check.py:72-75)."""
    return float(np.linalg.norm(enc.encode(img_a) - enc.encode(img_b)))
