"""Installed-weights registry: one place real extractor/encoder weights live.

This image ships no pretrained Inception or CLIP weights (zero egress), so
FID defaults to a random-conv proxy and CLIP text conditioning to a hash
proxy.  The reference presumes both are real (clean-fid's
pt_inception-2015-12-05.pt, scripts/compute_fid_scores_3dfront.py:132-161;
OpenAI CLIP ViT-B/32, dataset/threedfront_dataset.py:157-163).  This module
is the contract that makes flipping to real weights a zero-code-change
event:

  * `scripts/fetch_weights.py --inception SRC --clip SRC` installs weights
    under `weights_dir()` (`$ECHOSCENE_WEIGHTS_DIR`, default
    ~/.cache/echoscene_tpu/weights),
  * every 'auto' backend in the tree resolves through the getters here:
    eval/fid.get_extractor('auto'), data/clip_text.ClipTextEncoder('auto'),
    eval/clip_image.ClipImageEncoder('auto'),
  * tests/test_real_weights.py smoke-tests the real backends, skipif absent.

Layout under weights_dir():
  inception/pt_inception-2015-12-05.pt   (TorchScript, clean-fid export)
  inception/inception.npz                (converted JAX params — either works)
  clip-vit-base-patch32/                 (HuggingFace snapshot directory:
                                          config.json, tokenizer files,
                                          model weights)
"""
from __future__ import annotations

import os
import shutil
from typing import Dict, Optional

INCEPTION_PT = "pt_inception-2015-12-05.pt"
INCEPTION_NPZ = "inception.npz"
CLIP_DIRNAME = "clip-vit-base-patch32"


def weights_dir() -> str:
    return os.environ.get(
        "ECHOSCENE_WEIGHTS_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "echoscene_tpu",
                     "weights"))


def inception_weights() -> Optional[str]:
    """Path to installed Inception FID weights (.npz preferred, else the
    clean-fid TorchScript .pt), or None."""
    d = os.path.join(weights_dir(), "inception")
    for name in (INCEPTION_NPZ, INCEPTION_PT):
        p = os.path.join(d, name)
        if os.path.exists(p):
            return p
    return None


def clip_text_dir() -> Optional[str]:
    """Path to an installed HuggingFace CLIP snapshot directory, or None.

    A usable snapshot must carry a config.json plus weight files; the same
    directory serves the text (data/clip_text.py) and vision
    (eval/clip_image.py) towers — ViT-B/32 ships both."""
    d = os.path.join(weights_dir(), CLIP_DIRNAME)
    if os.path.isfile(os.path.join(d, "config.json")):
        return d
    return None


def _fetch(src: str, dst: str) -> None:
    """Copy a local file/dir or download a URL to dst."""
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    if src.startswith(("http://", "https://")):
        import urllib.request
        urllib.request.urlretrieve(src, dst)  # fails fast without egress
    elif os.path.isdir(src):
        if os.path.abspath(src) != os.path.abspath(dst):
            shutil.copytree(src, dst, dirs_exist_ok=True)
    elif os.path.isfile(src):
        shutil.copy2(src, dst)
    else:
        raise FileNotFoundError(src)


def install_inception(src: str) -> str:
    """Install FID Inception weights from a local path or URL.

    Accepts the clean-fid TorchScript export (pt_inception-2015-12-05.pt)
    or a pre-converted .npz; the JAX extractor converts .pt once and caches
    the .npz next to it (eval/inception_fid.load_params)."""
    name = INCEPTION_NPZ if src.endswith(".npz") else INCEPTION_PT
    dst = os.path.join(weights_dir(), "inception", name)
    _fetch(src, dst)
    return dst


def install_clip(src: str) -> str:
    """Install a HuggingFace CLIP ViT-B/32 snapshot (directory or URL of an
    archive is NOT supported — pass the snapshot directory)."""
    dst = os.path.join(weights_dir(), CLIP_DIRNAME)
    if not os.path.isdir(src):
        raise ValueError(
            f"--clip expects a HuggingFace snapshot DIRECTORY, got {src!r} "
            "(download with huggingface-cli or git-lfs where egress exists)")
    _fetch(src, dst)
    if clip_text_dir() is None:
        raise ValueError(f"{src} does not look like a HF snapshot "
                         "(no config.json)")
    return dst


def status() -> Dict[str, Optional[str]]:
    return {"weights_dir": weights_dir(),
            "inception": inception_weights(),
            "clip": clip_text_dir()}
