"""FID / KID between sets of top-down scene renders.

Behavioral reference: scripts/compute_fid_scores_3dfront.py:62-161 — the
reference shells out to `clean-fid` over two directories of 256^2 PNGs with
room-type filename filtering.  Here the metric math is implemented directly:

  * FID: Frechet distance between Gaussian fits of image features
    (||mu1 - mu2||^2 + Tr(C1 + C2 - 2 sqrt(C1 C2))),
  * KID: unbiased polynomial-kernel MMD^2, k(x, y) = (x.y/d + 1)^3, averaged
    over subsets (the clean-fid/KID convention).

Feature extractor is pluggable.  Without network access there are no
pretrained Inception weights in this image, so the default extractor is a
FIXED-SEED random conv network (jitted JAX) — a documented proxy: it defines
the same Frechet/MMD machinery over a deterministic feature space and is
consistent between the 'real' and 'generated' sets it compares.  Drop real
Inception weights via `extractor='inception:<path>'` when available.
"""
from __future__ import annotations

import os
from typing import Callable, List, Optional, Sequence

import numpy as np


# --- feature extractors ----------------------------------------------------
def random_conv_extractor(feature_dim: int = 768, seed: int = 0):
    """Deterministic random-conv feature net on (N, H, W, 3) uint8 -> (N, D)."""
    import jax
    import jax.numpy as jnp

    key = jax.random.PRNGKey(seed)
    ks = jax.random.split(key, 4)
    w1 = jax.random.normal(ks[0], (5, 5, 3, 32)) * (1 / np.sqrt(75))
    w2 = jax.random.normal(ks[1], (5, 5, 32, 64)) * (1 / np.sqrt(800))
    w3 = jax.random.normal(ks[2], (3, 3, 64, 128)) * (1 / np.sqrt(576))
    wf = jax.random.normal(ks[3], (128 * 2, feature_dim)) * (1 / np.sqrt(256))

    @jax.jit
    def feats(x):
        x = x.astype(jnp.float32) / 127.5 - 1.0
        for w, stride in ((w1, 2), (w2, 2), (w3, 2)):
            x = jax.lax.conv_general_dilated(
                x, w, (stride, stride), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            x = jnp.maximum(x, 0.0)
            x = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                      (1, 2, 2, 1), (1, 2, 2, 1), "SAME")
        mean = jnp.mean(x, axis=(1, 2))
        mx = jnp.max(x, axis=(1, 2))
        return jnp.concatenate([mean, mx], -1) @ wf

    return lambda imgs: np.asarray(feats(np.asarray(imgs)))


def torchscript_extractor(path: str, input_size: int = 299) -> Callable:
    """Feature extractor backed by a TorchScript module on CPU.

    This is how the standard FID Inception network plugs in: clean-fid /
    pytorch-fid distribute the ported TF InceptionV3 as a scripted module
    (`pt_inception-2015-12-05.pt`).  Input convention: (N, H, W, 3) uint8 ->
    resized to `input_size`, scaled to [-1, 1], NCHW.  Works with any
    scripted feature network of that signature (the unit test uses a tiny
    home-made one).
    """
    import torch

    model = torch.jit.load(path, map_location="cpu").eval()

    def run(imgs) -> np.ndarray:
        x = torch.from_numpy(np.asarray(imgs)).float().permute(0, 3, 1, 2)
        x = x / 255.0
        if tuple(x.shape[-2:]) != (input_size, input_size):
            x = torch.nn.functional.interpolate(
                x, size=(input_size, input_size), mode="bilinear",
                align_corners=False)
        x = x * 2.0 - 1.0
        with torch.no_grad():
            out = model(x)
        if isinstance(out, (list, tuple)):
            out = out[0]
        return out.reshape(out.shape[0], -1).numpy()

    return run


def get_extractor(spec: str = "random") -> Callable:
    """'inception:<path>' -> the JAX-native FID-Inception port
    (eval/inception_fid.py; weights converted from the TorchScript file once
    and cached as npz), falling back to the TorchScript runner if the file
    is not a convertible FID-Inception checkpoint.  'torchscript:<path>'
    forces the torch path.  'auto' -> installed real weights
    (scripts/fetch_weights.py / echoscene_tpu.weights) when present, else
    the random-conv proxy with a warning."""
    if spec == "auto":
        from ..weights import inception_weights
        path = inception_weights()
        if path is None:
            print("[fid] no installed Inception weights "
                  "(scripts/fetch_weights.py --inception ...); scores use "
                  "the random-conv PROXY — not comparable to published FID")
            return random_conv_extractor()
        spec = f"inception:{path}"
    if spec.startswith("torchscript:"):
        return torchscript_extractor(spec.split(":", 1)[1])
    if spec.startswith("inception:"):
        path = spec.split(":", 1)[1]
        try:
            from .inception_fid import jax_inception_extractor
            return jax_inception_extractor(path)
        except Exception as e:  # e.g. a scripted net that isn't FID-Inception
            print(f"[fid] JAX Inception port unavailable for {path} "
                  f"({type(e).__name__}: {e}); using TorchScript fallback")
            return torchscript_extractor(path)
    return random_conv_extractor()


# --- metric math -----------------------------------------------------------
def frechet_distance(feats1: np.ndarray, feats2: np.ndarray) -> float:
    from scipy import linalg
    mu1, mu2 = feats1.mean(0), feats2.mean(0)
    c1 = np.cov(feats1, rowvar=False)
    c2 = np.cov(feats2, rowvar=False)
    diff = mu1 - mu2
    covmean = linalg.sqrtm(c1 @ c2)  # may be complex for near-singular input
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff @ diff + np.trace(c1) + np.trace(c2)
                 - 2 * np.trace(covmean))


def kid_score(feats1: np.ndarray, feats2: np.ndarray,
              num_subsets: int = 100, subset_size: int = 100,
              seed: int = 0) -> float:
    """Unbiased polynomial-kernel MMD^2 averaged over subsets."""
    d = feats1.shape[1]
    n = min(subset_size, len(feats1), len(feats2))
    rng = np.random.default_rng(seed)
    k = lambda a, b: (a @ b.T / d + 1.0) ** 3
    total = 0.0
    for _ in range(num_subsets):
        x = feats1[rng.choice(len(feats1), n, replace=False)]
        y = feats2[rng.choice(len(feats2), n, replace=False)]
        kxx = k(x, x)
        kyy = k(y, y)
        kxy = k(x, y)
        total += ((kxx.sum() - np.trace(kxx)) / (n * (n - 1))
                  + (kyy.sum() - np.trace(kyy)) / (n * (n - 1))
                  - 2 * kxy.mean())
    return float(total / num_subsets)


# --- directory driver (compute_fid_scores_3dfront.py analog) ---------------
def load_image_dir(path: str, room_filter: Optional[Sequence[str]] = None,
                   size: int = 256) -> np.ndarray:
    from PIL import Image
    files = sorted(f for f in os.listdir(path)
                   if f.lower().endswith((".png", ".jpg")))
    if room_filter:
        files = [f for f in files if any(r in f for r in room_filter)]
    imgs = []
    for f in files:
        im = Image.open(os.path.join(path, f)).convert("RGB")
        if im.size != (size, size):
            im = im.resize((size, size))
        imgs.append(np.asarray(im, np.uint8))
    return np.stack(imgs) if imgs else np.zeros((0, size, size, 3), np.uint8)


ROOM_FILTERS = {
    # filename prefixes per room type (compute_fid_scores_3dfront.py:94-121)
    "bedroom": ["MasterBedroom", "SecondBedroom", "Bedroom"],
    "livingroom": ["LivingRoom", "LivingDiningRoom"],
    "diningroom": ["DiningRoom", "LivingDiningRoom"],
    "library": ["Library"],
    "all": None,
}


def compute_fid_kid(real_dir: str, fake_dir: str, room_type: str = "all",
                    extractor: str = "random", batch: int = 64):
    ext = get_extractor(extractor)
    filt = ROOM_FILTERS.get(room_type)
    real = load_image_dir(real_dir, filt)
    fake = load_image_dir(fake_dir, filt)
    assert len(real) > 1 and len(fake) > 1, (len(real), len(fake))

    def run(imgs):
        out = [ext(imgs[i:i + batch]) for i in range(0, len(imgs), batch)]
        return np.concatenate(out)

    fr, ff = run(real), run(fake)
    return {
        "fid": frechet_distance(fr, ff),
        "kid": kid_score(fr, ff,
                         subset_size=min(100, len(real), len(fake))),
        "n_real": len(real), "n_fake": len(fake),
    }
