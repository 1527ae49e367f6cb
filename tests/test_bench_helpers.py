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


def test_scan_body_counted_once():
    """PINS the XLA behavior sample_chain_flops corrects for: cost analysis
    counts a lax.scan body once, regardless of trip count.  If this ever
    fails (XLA starts multiplying by trip counts), the chain-flops
    reconstruction must be removed or it will double-correct."""
    x = jnp.ones((64, 64))
    one = jax.jit(lambda a: a @ a).lower(x)

    def scanned(a):
        out, _ = jax.lax.scan(lambda c, _: (c @ c, None), a, None, length=10)
        return out

    ten = jax.jit(scanned).lower(x)
    f_one, f_ten = _compiled_flops(one), _compiled_flops(ten)
    assert f_one == 2 * 64 ** 3
    # body once + a few flops of loop-counter arithmetic — nowhere near x10
    assert f_one <= f_ten < 1.01 * f_one


def test_lowered_cost_analysis_no_compile():
    """_compiled_flops accepts an UNCOMPILED Lowered (the cheap path
    sample_chain_flops relies on) and counts conv MACs."""
    y = jnp.ones((1, 8, 8, 8, 16))
    w = jnp.ones((3, 3, 3, 16, 16))
    lo = jax.jit(lambda a, b: jax.lax.conv_general_dilated(
        a, b, (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))).lower(y, w)
    f = _compiled_flops(lo)
    # SAME padding: XLA counts only the MACs actually needed at borders,
    # so the count is <= the dense 2*prod(out)*Cin*Cout*k^3 figure
    assert f is not None and 0.5 * 2 * 8**3 * 16 * 16 * 27 < f <= 2 * 8**3 * 16 * 16 * 27


def test_sample_chain_flops_multiplies_trip_counts():
    """At tiny dims (abstract params via eval_shape — nothing compiles), the
    reconstructed sampling FLOPs must exceed the raw program aggregate by
    roughly the chain lengths."""
    from echoscene_tpu.data.fake import make_fake_dataset
    from echoscene_tpu.data.sgfront import SGFrontDataset
    from echoscene_tpu.data.collate import collate_scenes, CollateSpec
    from echoscene_tpu.models.sgdiff import SGDiff, shape_row_capacity
    from echoscene_tpu.models.config import tiny_config
    from echoscene_tpu.benchmarks import sample_chain_flops
    import tempfile

    with tempfile.TemporaryDirectory() as root:
        make_fake_dataset(root, num_scenes=2, min_objs=3, max_objs=4,
                          sdf_res=16, with_sdf=True)
        ds = SGFrontDataset(root, use_sdf=True, with_changes=True, seed=0,
                            sdf_res=16)
        cfg = tiny_config()
        spec = CollateSpec(max_nodes=cfg.max_nodes,
                           max_triples=cfg.max_triples,
                           max_scenes=cfg.batch_scenes,
                           diffusion_bs=cfg.diffusion_bs, with_sdf=True,
                           sdf_res=16)
        batch = collate_scenes([ds[i] for i in range(2)], spec,
                               sdf_loader=ds.load_sdf)
        sg = SGDiff(cfg, num_objs=len(ds.classes),
                    num_preds=len(ds.pred_names))
    state = jax.eval_shape(lambda k: sg.init(k, batch),
                           jax.random.PRNGKey(0))
    rows = shape_row_capacity(batch)

    args = (state.params, state.batch_stats, batch, jax.random.PRNGKey(0))
    aggregate = _compiled_flops(jax.jit(
        lambda p, bs, b, k: sg.sample_fn(p, bs, b, k, gen_shape=True,
                                         shape_rows=rows)).lower(*args))
    total = sample_chain_flops(sg, state, batch, rows, gen_shape=True)
    assert total is not None and aggregate is not None
    t_layout = cfg.layout_diffusion.time_num   # tiny config's ddpm chain
    # the layout body alone rides t_layout times; the whole reconstruction
    # must exceed the body-once aggregate by a healthy multiple
    assert total > 3 * aggregate
    assert total < (t_layout + cfg.shape_branch.ddim_steps + 8) * aggregate
    # layout-only variant: exactly t_layout * (prologue + layout body)
    layout_only = sample_chain_flops(sg, state, batch, rows, gen_shape=False)
    assert layout_only is not None and layout_only < total
