"""JAX FID-Inception port vs an independent torch reference implementation.

Both sides implement the pytorch-fid FID-InceptionV3 spec (count_include_pad
=False average pools, max-pool InceptionE_2); agreeing on random weights +
random input validates convs/padding/BN-folding/pool semantics end to end.
With the real `pt_inception-2015-12-05.pt` the same converter path loads the
published weights (cached as npz).
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from echoscene_tpu.eval.inception_fid import (conv_specs, convert_state_dict,
                                              _forward, load_params)

pytestmark = pytest.mark.slow


def random_state_dict(seed=0):
    rng = np.random.default_rng(seed)
    sd = {}
    for s in conv_specs():
        kh, kw = s["k"]
        fan_in = s["cin"] * kh * kw
        sd[f"{s['name']}.conv.weight"] = torch.tensor(
            rng.normal(0, np.sqrt(2.0 / fan_in),
                       size=(s["cout"], s["cin"], kh, kw)).astype(np.float32))
        sd[f"{s['name']}.bn.weight"] = torch.tensor(
            rng.uniform(0.5, 1.5, s["cout"]).astype(np.float32))
        sd[f"{s['name']}.bn.bias"] = torch.tensor(
            rng.normal(0, 0.1, s["cout"]).astype(np.float32))
        sd[f"{s['name']}.bn.running_mean"] = torch.tensor(
            rng.normal(0, 0.1, s["cout"]).astype(np.float32))
        sd[f"{s['name']}.bn.running_var"] = torch.tensor(
            rng.uniform(0.5, 1.5, s["cout"]).astype(np.float32))
    return sd


def torch_reference(sd, x):
    """Independent torch forward of the FID-Inception spec (NCHW)."""
    import torch.nn.functional as F

    specs = {s["name"]: s for s in conv_specs()}

    def c(n, v):
        s = specs[n]
        v = F.conv2d(v, sd[f"{n}.conv.weight"], stride=s["stride"],
                     padding=s["pad"])
        v = F.batch_norm(v, sd[f"{n}.bn.running_mean"],
                         sd[f"{n}.bn.running_var"], sd[f"{n}.bn.weight"],
                         sd[f"{n}.bn.bias"], training=False, eps=1e-3)
        return F.relu(v)

    avg = lambda v: F.avg_pool2d(v, 3, stride=1, padding=1,
                                 count_include_pad=False)
    cat = torch.cat

    x = c("Conv2d_2b_3x3", c("Conv2d_2a_3x3", c("Conv2d_1a_3x3", x)))
    x = F.max_pool2d(x, 3, 2)
    x = c("Conv2d_4a_3x3", c("Conv2d_3b_1x1", x))
    x = F.max_pool2d(x, 3, 2)
    for n in ("Mixed_5b", "Mixed_5c", "Mixed_5d"):
        x = cat([c(f"{n}.branch1x1", x),
                 c(f"{n}.branch5x5_2", c(f"{n}.branch5x5_1", x)),
                 c(f"{n}.branch3x3dbl_3", c(f"{n}.branch3x3dbl_2",
                                            c(f"{n}.branch3x3dbl_1", x))),
                 c(f"{n}.branch_pool", avg(x))], 1)
    x = cat([c("Mixed_6a.branch3x3", x),
             c("Mixed_6a.branch3x3dbl_3", c("Mixed_6a.branch3x3dbl_2",
                                            c("Mixed_6a.branch3x3dbl_1", x))),
             F.max_pool2d(x, 3, 2)], 1)
    for n in ("Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e"):
        bd = x
        for i in (1, 2, 3, 4, 5):
            bd = c(f"{n}.branch7x7dbl_{i}", bd)
        x = cat([c(f"{n}.branch1x1", x),
                 c(f"{n}.branch7x7_3", c(f"{n}.branch7x7_2",
                                         c(f"{n}.branch7x7_1", x))),
                 bd, c(f"{n}.branch_pool", avg(x))], 1)
    b7 = x
    for i in (1, 2, 3, 4):
        b7 = c(f"Mixed_7a.branch7x7x3_{i}", b7)
    x = cat([c("Mixed_7a.branch3x3_2", c("Mixed_7a.branch3x3_1", x)),
             b7, F.max_pool2d(x, 3, 2)], 1)
    for n, maxp in (("Mixed_7b", False), ("Mixed_7c", True)):
        b3 = c(f"{n}.branch3x3_1", x)
        b3 = cat([c(f"{n}.branch3x3_2a", b3), c(f"{n}.branch3x3_2b", b3)], 1)
        bd = c(f"{n}.branch3x3dbl_2", c(f"{n}.branch3x3dbl_1", x))
        bd = cat([c(f"{n}.branch3x3dbl_3a", bd),
                  c(f"{n}.branch3x3dbl_3b", bd)], 1)
        pool = (F.max_pool2d(x, 3, 1, 1) if maxp else avg(x))
        x = cat([c(f"{n}.branch1x1", x), b3, bd,
                 c(f"{n}.branch_pool", pool)], 1)
    return x.mean(dim=(2, 3))


def test_jax_port_matches_torch_reference():
    import jax.numpy as jnp
    sd = random_state_dict()
    rng = np.random.default_rng(1)
    x = rng.uniform(-1, 1, size=(1, 149, 149, 3)).astype(np.float32)

    with torch.no_grad():
        want = torch_reference(sd, torch.tensor(
            x.transpose(0, 3, 1, 2))).numpy()

    params = convert_state_dict({k: v.numpy() for k, v in sd.items()})
    got = np.asarray(_forward({k: jnp.asarray(v) for k, v in params.items()},
                              jnp.asarray(x)))
    assert got.shape == want.shape == (1, 2048)
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=2e-3)


def test_npz_cache_roundtrip(tmp_path):
    sd = random_state_dict()
    params = convert_state_dict({k: v.numpy() for k, v in sd.items()})
    p = str(tmp_path / "weights.npz")
    np.savez_compressed(p, **params)
    loaded = load_params(p)
    assert set(loaded) == set(params)
    np.testing.assert_allclose(loaded["Conv2d_1a_3x3.kernel"],
                               params["Conv2d_1a_3x3.kernel"])


def test_extractor_from_npz(tmp_path):
    from echoscene_tpu.eval.inception_fid import jax_inception_extractor
    sd = random_state_dict()
    params = convert_state_dict({k: v.numpy() for k, v in sd.items()})
    p = str(tmp_path / "weights.npz")
    np.savez_compressed(p, **params)
    ext = jax_inception_extractor(p, input_size=149)
    imgs = np.random.default_rng(0).integers(
        0, 255, size=(2, 64, 64, 3)).astype(np.uint8)
    feats = ext(imgs)
    assert feats.shape == (2, 2048)
    assert np.isfinite(feats).all()
