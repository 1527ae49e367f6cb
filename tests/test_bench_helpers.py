"""Bench harness helpers: XLA cost-analysis FLOPs + chip peak table.

The timers themselves are exercised on hardware by bench.py; these pin the
machine-checked-MFU plumbing (VERDICT r3 Next #5) at CPU scale.
"""
import jax
import jax.numpy as jnp

from echoscene_tpu.benchmarks import _compiled_flops, chip_peak_flops


def test_compiled_flops_matmul_exact():
    n = 64
    f = jax.jit(lambda a, b: a @ b)
    c = f.lower(jnp.ones((n, n)), jnp.ones((n, n))).compile()
    flops = _compiled_flops(c)
    assert flops == 2 * n ** 3   # XLA counts 2*MACs


def test_compiled_flops_none_on_failure():
    class Broken:
        def cost_analysis(self):
            raise RuntimeError("no analysis")
    assert _compiled_flops(Broken()) is None

    class Zero:
        def cost_analysis(self):
            return {"flops": 0.0}
    assert _compiled_flops(Zero()) is None


def test_chip_peak_flops_known_kinds():
    # table is keyed on device_kind substrings; CPU backend -> None
    if jax.devices()[0].platform == "cpu":
        assert chip_peak_flops() is None
    else:
        peak = chip_peak_flops()
        assert peak is None or peak > 1e13
