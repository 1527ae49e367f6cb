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
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
