"""Test harness: run everything on a virtual 8-device CPU mesh.

Must set the XLA flags BEFORE jax is imported anywhere, hence the env mutation
at module import time (pytest imports conftest first).
"""
import os

# force CPU even when the ambient env selects the TPU platform (tests need
# f32-exact math and an 8-device virtual mesh).  NOTE: this image's
# sitecustomize imports jax and pins the TPU platform before conftest runs, so
# the env var alone is not enough — the config update below is the effective
# switch (it works because no backend has been initialised yet).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_llvm_disable_expensive_passes" not in flags:
    # semantics-preserving LLVM opt-level cut: ~13% off XLA:CPU compile
    # times, which dominate this suite's wall clock on the 1-core image
    flags = (flags + " --xla_llvm_disable_expensive_passes=true").strip()
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Model-INIT compiles dominated the suite (threefry lowering emits a large
# op graph per param draw; the flagship-shaped init programs took 45-160 s
# to compile on this 1-core image).  The rbg generator compiles ~4x faster
# and is equally deterministic per key — test assertions never depend on the
# specific threefry stream (parity tests copy weights; golden tests are
# RNG-free schedule math; determinism tests hold under any impl).
jax.config.update("jax_default_prng_impl", "rbg")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def perturb_params(tree, scale: float = 0.05, seed: int = 3):
    """Add deterministic noise to every float leaf of a variables tree.

    Zero-init output heads (reference zero_module semantics) make a
    fresh-init forward return EXACTLY zero, so "implementation A tracks
    implementation B" comparisons pass vacuously on pristine params.  Tests
    comparing two compute paths must run on perturbed params."""
    import jax.numpy as jnp

    leaves, treedef = jax.tree.flatten(tree)
    r = np.random.default_rng(seed)
    out = []
    for a in leaves:
        if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating):
            out.append(a + jnp.asarray(
                r.normal(0.0, scale, a.shape), a.dtype))
        else:
            out.append(a)
    return jax.tree.unflatten(treedef, out)


# One tiny-but-structurally-complete ShapeDenoiser shared across files
# (test_nn_modules, test_quant): jit-compiling a fresh full-UNet init is
# 15-50 s on this 1-core image, so every test that just needs "a denoiser
# forward" reuses ONE init and ONE jitted f32 apply.
SHAPE_DEN_KW = dict(
    image_size=8, in_channels=3, model_channels=16, out_channels=3,
    num_res_blocks=1, attention_resolutions=(2,), channel_mult=(1, 2),
    num_heads=4, context_dim=32, gconv_dim=8, gconv_num_layers=2,
    conditioning_key="crossattn", message_passing=True, enable_t_emb=True,
    use_checkpoint=False, num_preds=16)


@pytest.fixture(scope="session")
def shape_den_small():
    import jax.numpy as jnp
    from echoscene_tpu.nn.unet3d import ShapeDenoiser

    model = ShapeDenoiser(**SHAPE_DEN_KW)
    r = np.random.default_rng(7)
    M, T, R = 4, 6, 8
    x = jnp.asarray(r.normal(size=(M, R, R, R, 3)).astype(np.float32))
    obj = jnp.asarray(r.normal(size=(M, 1, 24)).astype(np.float32))
    tri = jnp.asarray(np.stack(
        [r.integers(0, M, T), r.integers(0, 16, T),
         r.integers(0, M, T)], 1).astype(np.int32))
    t = jnp.asarray(r.integers(0, 1000, M).astype(np.int32))
    masks = dict(obj_mask=jnp.ones((M,), jnp.float32),
                 triple_mask=jnp.ones((T,), jnp.float32))
    vars0 = jax.jit(model.init)(jax.random.PRNGKey(0), x, obj, tri, t,
                                **masks)
    apply32 = jax.jit(lambda v: model.apply(v, x, obj, tri, t, **masks))
    return dict(model=model, kw=SHAPE_DEN_KW, vars0=vars0, x=x, obj=obj,
                tri=tri, t=t, masks=masks, apply32=apply32)
