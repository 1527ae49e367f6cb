"""JAX-native FID InceptionV3 feature network.

Port of the pytorch-fid / clean-fid feature extractor (the TF-Inception
weights shipped as `pt_inception-2015-12-05.pt`, used by the reference's FID
protocol via clean-fid — scripts/compute_fid_scores_3dfront.py:132-161).
Architecture: torchvision InceptionV3 with the FID modifications — every
average pool uses count_include_pad=False, and the final InceptionE block
pools with MAX instead of AVG (pytorch-fid inception.py FIDInceptionA/C/E_1/
E_2).

Weights load from the TorchScript file once (torch CPU required only for
conversion) and are cached as an .npz next to it; feature extraction itself
is pure jitted JAX (TPU/CPU), eval-mode BatchNorm folded into per-channel
affines.

Contract (matches eval/fid.torchscript_extractor): uint8 (N, H, W, 3) ->
bilinear resize to 299 -> [-1, 1] -> (N, 2048) pool3 features.
"""
from __future__ import annotations

import os
from typing import Dict, Tuple

import numpy as np

BN_EPS = 1e-3


# --- architecture table ------------------------------------------------------
def _bc(name, cin, cout, k, stride=1, pad=0):
    """BasicConv2d spec: conv(no bias) + BN(eps 1e-3) + relu."""
    if isinstance(k, int):
        k = (k, k)
    if isinstance(pad, int):
        pad = (pad, pad)
    return dict(name=name, cin=cin, cout=cout, k=k, stride=stride, pad=pad)


def conv_specs():
    """Every BasicConv2d in FID-InceptionV3, in state-dict order."""
    s = []
    s += [_bc("Conv2d_1a_3x3", 3, 32, 3, 2), _bc("Conv2d_2a_3x3", 32, 32, 3),
          _bc("Conv2d_2b_3x3", 32, 64, 3, 1, 1),
          _bc("Conv2d_3b_1x1", 64, 80, 1), _bc("Conv2d_4a_3x3", 80, 192, 3)]
    # InceptionA(in, pool_features)
    for name, cin, pf in (("Mixed_5b", 192, 32), ("Mixed_5c", 256, 64),
                          ("Mixed_5d", 288, 64)):
        s += [_bc(f"{name}.branch1x1", cin, 64, 1),
              _bc(f"{name}.branch5x5_1", cin, 48, 1),
              _bc(f"{name}.branch5x5_2", 48, 64, 5, 1, 2),
              _bc(f"{name}.branch3x3dbl_1", cin, 64, 1),
              _bc(f"{name}.branch3x3dbl_2", 64, 96, 3, 1, 1),
              _bc(f"{name}.branch3x3dbl_3", 96, 96, 3, 1, 1),
              _bc(f"{name}.branch_pool", cin, pf, 1)]
    # InceptionB(288)
    s += [_bc("Mixed_6a.branch3x3", 288, 384, 3, 2),
          _bc("Mixed_6a.branch3x3dbl_1", 288, 64, 1),
          _bc("Mixed_6a.branch3x3dbl_2", 64, 96, 3, 1, 1),
          _bc("Mixed_6a.branch3x3dbl_3", 96, 96, 3, 2)]
    # InceptionC(768, c7)
    for name, c7 in (("Mixed_6b", 128), ("Mixed_6c", 160), ("Mixed_6d", 160),
                     ("Mixed_6e", 192)):
        s += [_bc(f"{name}.branch1x1", 768, 192, 1),
              _bc(f"{name}.branch7x7_1", 768, c7, 1),
              _bc(f"{name}.branch7x7_2", c7, c7, (1, 7), 1, (0, 3)),
              _bc(f"{name}.branch7x7_3", c7, 192, (7, 1), 1, (3, 0)),
              _bc(f"{name}.branch7x7dbl_1", 768, c7, 1),
              _bc(f"{name}.branch7x7dbl_2", c7, c7, (7, 1), 1, (3, 0)),
              _bc(f"{name}.branch7x7dbl_3", c7, c7, (1, 7), 1, (0, 3)),
              _bc(f"{name}.branch7x7dbl_4", c7, c7, (7, 1), 1, (3, 0)),
              _bc(f"{name}.branch7x7dbl_5", c7, 192, (1, 7), 1, (0, 3)),
              _bc(f"{name}.branch_pool", 768, 192, 1)]
    # InceptionD(768)
    s += [_bc("Mixed_7a.branch3x3_1", 768, 192, 1),
          _bc("Mixed_7a.branch3x3_2", 192, 320, 3, 2),
          _bc("Mixed_7a.branch7x7x3_1", 768, 192, 1),
          _bc("Mixed_7a.branch7x7x3_2", 192, 192, (1, 7), 1, (0, 3)),
          _bc("Mixed_7a.branch7x7x3_3", 192, 192, (7, 1), 1, (3, 0)),
          _bc("Mixed_7a.branch7x7x3_4", 192, 192, 3, 2)]
    # InceptionE(1280) / InceptionE(2048)
    for name, cin in (("Mixed_7b", 1280), ("Mixed_7c", 2048)):
        s += [_bc(f"{name}.branch1x1", cin, 320, 1),
              _bc(f"{name}.branch3x3_1", cin, 384, 1),
              _bc(f"{name}.branch3x3_2a", 384, 384, (1, 3), 1, (0, 1)),
              _bc(f"{name}.branch3x3_2b", 384, 384, (3, 1), 1, (1, 0)),
              _bc(f"{name}.branch3x3dbl_1", cin, 448, 1),
              _bc(f"{name}.branch3x3dbl_2", 448, 384, 3, 1, 1),
              _bc(f"{name}.branch3x3dbl_3a", 384, 384, (1, 3), 1, (0, 1)),
              _bc(f"{name}.branch3x3dbl_3b", 384, 384, (3, 1), 1, (1, 0)),
              _bc(f"{name}.branch_pool", cin, 192, 1)]
    return s


# --- weight conversion -------------------------------------------------------
def convert_state_dict(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """pytorch-fid state_dict -> flat params: per BasicConv2d a kernel
    (HWIO) + BN folded into (scale, bias)."""
    params: Dict[str, np.ndarray] = {}
    found = 0
    for spec in conv_specs():
        n = spec["name"]
        # the TorchScript module nests blocks under `blocks.N.M.`; accept
        # both flat pytorch-fid names and any prefix ending with the name
        def get(suffix):
            key = f"{n}.{suffix}"
            if key in sd:
                return np.asarray(sd[key], np.float32)
            for k in sd:
                if k.endswith(key):
                    return np.asarray(sd[k], np.float32)
            raise KeyError(key)
        w = get("conv.weight")                      # (O, I, H, W)
        bw, bb = get("bn.weight"), get("bn.bias")
        rm, rv = get("bn.running_mean"), get("bn.running_var")
        scale = bw / np.sqrt(rv + BN_EPS)
        params[f"{n}.kernel"] = w.transpose(2, 3, 1, 0)   # HWIO
        params[f"{n}.scale"] = scale
        params[f"{n}.bias"] = bb - rm * scale
        found += 1
    assert found == len(conv_specs())
    return params


def load_params(path: str) -> Dict[str, np.ndarray]:
    """Load converted params; for a TorchScript/.pth file convert via torch
    once and cache as `<path>.npz`."""
    if path.endswith(".npz"):
        return dict(np.load(path))
    cache = path + ".fidjax.npz"
    if os.path.exists(cache):
        return dict(np.load(cache))
    import torch
    try:
        mod = torch.jit.load(path, map_location="cpu")
        sd = {k: v.numpy() for k, v in mod.state_dict().items()}
    except Exception:
        sd = torch.load(path, map_location="cpu")
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
        sd = {k: np.asarray(v) for k, v in sd.items()}
    params = convert_state_dict(sd)
    np.savez_compressed(cache, **params)
    return params


# --- forward -----------------------------------------------------------------
def _conv(params, name, x, spec):
    import jax
    import jax.numpy as jnp
    k = jnp.asarray(params[f"{name}.kernel"])
    ph, pw = spec["pad"]
    y = jax.lax.conv_general_dilated(
        x, k, (spec["stride"], spec["stride"]),
        [(ph, ph), (pw, pw)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = y * params[f"{name}.scale"] + params[f"{name}.bias"]
    return jnp.maximum(y, 0.0)


def _max_pool(x, k=3, s=2, pad=0):
    import jax
    import jax.numpy as jnp
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, k, k, 1), (1, s, s, 1),
        [(0, 0), (pad, pad), (pad, pad), (0, 0)])


def _avg_pool_cip_false(x, k=3):
    """3x3 stride-1 pad-1 average pool with count_include_pad=False —
    the FID-Inception modification (divide by the number of VALID taps)."""
    import jax
    import jax.numpy as jnp
    win = (1, k, k, 1)
    strides = (1, 1, 1, 1)
    pad = [(0, 0), (1, 1), (1, 1), (0, 0)]
    s = jax.lax.reduce_window(x, 0.0, jax.lax.add, win, strides, pad)
    ones = jnp.ones(x.shape[:3] + (1,), x.dtype)
    cnt = jax.lax.reduce_window(ones, 0.0, jax.lax.add, win, strides, pad)
    return s / cnt


def _forward(params, x):
    """x: (N, 299, 299, 3) in [-1, 1] -> (N, 2048)."""
    import jax.numpy as jnp
    spec = {s["name"]: s for s in conv_specs()}
    c = lambda n, v: _conv(params, n, v, spec[n])

    x = c("Conv2d_1a_3x3", x)
    x = c("Conv2d_2a_3x3", x)
    x = c("Conv2d_2b_3x3", x)
    x = _max_pool(x)
    x = c("Conv2d_3b_1x1", x)
    x = c("Conv2d_4a_3x3", x)
    x = _max_pool(x)

    for name in ("Mixed_5b", "Mixed_5c", "Mixed_5d"):     # InceptionA
        b1 = c(f"{name}.branch1x1", x)
        b5 = c(f"{name}.branch5x5_2", c(f"{name}.branch5x5_1", x))
        b3 = c(f"{name}.branch3x3dbl_3",
               c(f"{name}.branch3x3dbl_2", c(f"{name}.branch3x3dbl_1", x)))
        bp = c(f"{name}.branch_pool", _avg_pool_cip_false(x))
        x = jnp.concatenate([b1, b5, b3, bp], -1)

    b3 = c("Mixed_6a.branch3x3", x)                       # InceptionB
    bd = c("Mixed_6a.branch3x3dbl_3",
           c("Mixed_6a.branch3x3dbl_2", c("Mixed_6a.branch3x3dbl_1", x)))
    x = jnp.concatenate([b3, bd, _max_pool(x)], -1)

    for name in ("Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e"):  # InceptionC
        b1 = c(f"{name}.branch1x1", x)
        b7 = c(f"{name}.branch7x7_3",
               c(f"{name}.branch7x7_2", c(f"{name}.branch7x7_1", x)))
        bd = x
        for i in (1, 2, 3, 4, 5):
            bd = c(f"{name}.branch7x7dbl_{i}", bd)
        bp = c(f"{name}.branch_pool", _avg_pool_cip_false(x))
        x = jnp.concatenate([b1, b7, bd, bp], -1)

    b3 = c("Mixed_7a.branch3x3_2", c("Mixed_7a.branch3x3_1", x))  # InceptionD
    b7 = x
    for i in (1, 2, 3, 4):
        b7 = c(f"Mixed_7a.branch7x7x3_{i}", b7)
    x = jnp.concatenate([b3, b7, _max_pool(x)], -1)

    for name, maxp in (("Mixed_7b", False), ("Mixed_7c", True)):  # InceptionE
        b1 = c(f"{name}.branch1x1", x)
        b3 = c(f"{name}.branch3x3_1", x)
        b3 = jnp.concatenate([c(f"{name}.branch3x3_2a", b3),
                              c(f"{name}.branch3x3_2b", b3)], -1)
        bd = c(f"{name}.branch3x3dbl_2", c(f"{name}.branch3x3dbl_1", x))
        bd = jnp.concatenate([c(f"{name}.branch3x3dbl_3a", bd),
                              c(f"{name}.branch3x3dbl_3b", bd)], -1)
        pooled = (_max_pool(x, k=3, s=1, pad=1) if maxp
                  else _avg_pool_cip_false(x))
        bp = c(f"{name}.branch_pool", pooled)
        x = jnp.concatenate([b1, b3, bd, bp], -1)

    return jnp.mean(x, axis=(1, 2))                       # (N, 2048)


def jax_inception_extractor(path: str, input_size: int = 299):
    """uint8 (N, H, W, 3) -> (N, 2048) features, all-JAX after one-time
    weight conversion.  Drop-in for eval.fid extractors."""
    import jax
    import jax.numpy as jnp

    params = {k: jnp.asarray(v) for k, v in load_params(path).items()}

    @jax.jit
    def feats(imgs):
        x = imgs.astype(jnp.float32) / 255.0
        if x.shape[1] != input_size or x.shape[2] != input_size:
            x = jax.image.resize(
                x, (x.shape[0], input_size, input_size, 3), "bilinear")
        return _forward(params, x * 2.0 - 1.0)

    return lambda imgs: np.asarray(feats(jnp.asarray(np.asarray(imgs))))
