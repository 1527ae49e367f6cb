"""Benchmark harness: flagship model construction + throughput timing.

Shared by the driver entry points (`__graft_entry__.py`) and the root
`bench.py`.  The reference never measured throughput (its timing code is
commented out, scripts/train_3dfront.py:283-285); the harness here defines
the measured protocol: full dual-branch generation (1000-step layout DDPM +
100-step shape DDIM + VQ decode) at flagship dimensions on synthetic
SG-FRONT-format data.
"""
from __future__ import annotations

import os
import tempfile
import time
from typing import Optional, Tuple


def build_flagship(max_nodes: int = 64, max_triples: int = 128,
                   diffusion_bs: int = 8, batch_scenes: int = 8,
                   tiny: bool = False,
                   config_path: Optional[str] = None,
                   sample_dtype: Optional[str] = None,
                   compute_dtype: Optional[str] = None,
                   fast_profile: bool = False,
                   latents: bool = False,
                   use_checkpoint: Optional[bool] = None) -> Tuple:
    """Flagship EchoScene (full_mp.yaml dims) + one synthetic collated batch.

    Returns (sgdiff, train_state, scene_batch).  `tiny=True` keeps the
    structure but shrinks every width for CPU dry runs.
    """
    import jax
    from .data.fake import make_fake_dataset
    from .data.sgfront import SGFrontDataset
    from .data.collate import collate_scenes, CollateSpec
    from .models.config import load_config
    from .models.sgdiff import SGDiff

    sdf_res = 64 if not tiny else 16
    root = os.path.join(tempfile.gettempdir(),
                        f"echoscene_graft_fake_r{sdf_res}_s{batch_scenes}")
    if not os.path.isdir(root) or not os.listdir(root):
        make_fake_dataset(root, num_scenes=batch_scenes, min_objs=3,
                          max_objs=5, sdf_res=sdf_res, with_sdf=True)
    ds = SGFrontDataset(root, use_sdf=True, with_changes=True, seed=0,
                        sdf_res=sdf_res)
    if config_path is None:
        config_path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "configs", "full_mp.yaml")
    cfg = load_config(config_path)
    cfg.max_nodes, cfg.max_triples = max_nodes, max_triples
    cfg.diffusion_bs = diffusion_bs
    cfg.batch_scenes = batch_scenes
    if sample_dtype is not None:
        cfg.sample_dtype = sample_dtype
    if compute_dtype is not None:
        cfg.compute_dtype = compute_dtype
    if fast_profile:
        # the opt-in serving configuration (BASELINE.md): int8 W8A8 shape-UNet
        # convs + DPM-Solver++(2M) 50-step layout / 20-step shape chains —
        # jointly quality-validated on the synthetic-trained model
        cfg.sample_dtype = "int8"
        cfg.layout_diffusion.sampler = "dpmpp"
        cfg.layout_diffusion.sample_steps = 50
        cfg.shape_branch.sampler = "dpmpp"
        cfg.shape_branch.ddim_steps = 20
    if use_checkpoint is not None:
        # remat A/B hook (scripts/bench_train_remat.py): the reference trains
        # with gradient checkpointing always on (config/full_mp.yaml
        # `checkpoint: True`); on TPU the memory it saves may not be needed
        cfg.layout_denoiser.use_checkpoint = use_checkpoint
        cfg.shape_branch.denoiser.use_checkpoint = use_checkpoint
    if tiny:
        shrink_config(cfg)
    spec = CollateSpec(max_nodes=max_nodes, max_triples=max_triples,
                       max_scenes=batch_scenes, diffusion_bs=diffusion_bs,
                       with_sdf=True, sdf_res=ds.sdf_res)
    examples = [ds[i] for i in range(batch_scenes)]
    batch = collate_scenes(examples, spec, sdf_loader=ds.load_sdf)
    sg = SGDiff(cfg, num_objs=len(ds.classes), num_preds=len(ds.pred_names),
                iou_stats=ds.box_stats)
    state = sg.init(jax.random.PRNGKey(0), batch)
    if latents:
        batch = to_latent_batch(sg, state, batch)
    return sg, state, batch


def to_latent_batch(sg, state, batch):
    """Swap the shape sub-batch's SDF grids for the frozen VQ encoder's
    latents — the scripts/precompute_latents.py training configuration.

    The latents are produced by the SAME module method the loss would run
    (EchoSceneModule.encode_sdf), so loss values match the SDF path to
    float rounding while the per-step frozen-VQ encode (diffusion_bs x 64^3
    grids through the encoder, every optimizer step) drops out of the
    compiled train program entirely."""
    import jax

    from .models.echo_scene import EchoSceneModule

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    z = jax.jit(lambda v, s: sg.module.apply(
        v, s, method=EchoSceneModule.encode_sdf))(variables, batch.shapes.sdf)
    return batch.replace(shapes=batch.shapes.replace(sdf=None, latent=z))


def shrink_config(cfg) -> None:
    """Structurally identical, narrow widths for CPU dry runs.

    Compile time on the single-core CPU image scales with HLO op COUNT, not
    widths — the deepest cuts are the six 5-layer echo/encoder GCNs
    (gconv_num_layers) and head counts, not channel sizes (MULTICHIP_r02
    post-mortem: the r2 dryrun timed out at 8+ min; these cuts brought the
    full train + dp x tp sample dryrun under the 5-min budget)."""
    cfg.gconv_num_layers = 2
    cfg.shape_branch.ddim_steps = 3
    cfg.embedding_dim = 8
    cfg.layout_denoiser.model_channels = 32
    cfg.layout_denoiser.channel_mult = (1, 1)
    cfg.layout_denoiser.num_res_blocks = 1
    cfg.layout_denoiser.num_heads = 2
    cfg.layout_denoiser.gconv_num_layers = 2
    cfg.layout_denoiser.concat_dim = 32
    cfg.layout_denoiser.crossattn_dim = 32
    cfg.layout_denoiser.use_checkpoint = False
    cfg.layout_diffusion.time_num = 6
    sd = cfg.shape_branch.denoiser
    sd.image_size = 4
    sd.model_channels = 8
    sd.channel_mult = (1, 2)
    sd.num_res_blocks = 1
    sd.context_dim = 32
    sd.timesteps = 8
    sd.use_checkpoint = False
    sd.gconv_num_layers = 2
    sd.num_heads = 2
    vq = cfg.shape_branch.vqvae
    vq.ch = 4
    vq.n_embed = 16
    vq.resolution = 16


def _compiled_flops(compiled) -> Optional[float]:
    """XLA's analytic FLOP count for a compiled executable OR an uncompiled
    jax.stages.Lowered (both expose cost_analysis; the Lowered form needs no
    backend compile — pure tracing).  None if unavailable.

    CAVEAT (pinned by tests/test_bench_helpers.py::test_scan_body_counted_once):
    the count includes a lax.scan / lax.map / while-loop BODY exactly ONCE,
    regardless of trip count.  Aggregates over chain programs therefore
    undercount by the chain length — use sample_chain_flops for sampling."""
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        f = float(ca.get("flops", 0.0))
        return f if f > 0 else None
    except Exception:
        return None


def _abstract(tree):
    """Shape/dtype skeleton of a pytree — lowering with abstract args never
    touches device data AND lets jit pick the backend from the ambient
    default device (committed arrays would pin it)."""
    import jax

    return jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype)
        if hasattr(x, "dtype") else x, tree)


_LOWERED_CA_WORKS: Optional[bool] = None


def _default_backend_lowered_ca() -> bool:
    """Once per process: does Lowered.cost_analysis work on the default
    backend?  (It returns None on the axon TPU plugin.)  Probed with a tiny
    matmul so the big chain programs are only lowered on a backend whose
    analysis will actually be read."""
    global _LOWERED_CA_WORKS
    if _LOWERED_CA_WORKS is None:
        import jax
        import jax.numpy as jnp

        lo = jax.jit(lambda a: a @ a).lower(
            jax.ShapeDtypeStruct((8, 8), jnp.float32))
        _LOWERED_CA_WORKS = _compiled_flops(lo) is not None
    return _LOWERED_CA_WORKS


def _trace_flops(fn, *args) -> Optional[float]:
    """Analytic FLOPs of fn(*args) from an UNCOMPILED lowering (tracing only).

    The axon TPU plugin's Lowered.cost_analysis returns None, so fall back to
    lowering the same function for the in-process CPU backend — the count is
    platform-independent HLO arithmetic."""
    import jax

    args = _abstract(args)
    if _default_backend_lowered_ca():
        return _compiled_flops(jax.jit(fn).lower(*args))
    try:
        cpu = jax.devices("cpu")
    except Exception:
        return None
    from .kernels import attention as _attn
    old = _attn._DISABLE
    _attn._DISABLE = True   # the Mosaic flash kernel doesn't lower for CPU;
    try:                    # einsum attention counts the same matmul FLOPs
        with jax.default_device(cpu[0]):
            return _compiled_flops(jax.jit(fn).lower(*args))
    finally:
        _attn._DISABLE = old


def sample_chain_flops(sg, state, batch, rows: int, gen_shape: bool = True,
                       decode_chunk: int = 8) -> Optional[float]:
    """Trip-count-correct FLOPs for ONE sampling dispatch.

    XLA's cost analysis counts loop bodies once (see _compiled_flops), so the
    protocol chain's aggregate understates the real work by ~3 orders of
    magnitude (1000-step layout scan + 100-step shape scan + chunked VQ
    decode map).  Recover per-body counts from uncompiled lowerings
    (_trace_flops — tracing only, no backend compile):

        A = full program        = prologue + layout_body + shape_body + decode_body
        B = gen_shape=False     = prologue + layout_body
        D = decode-chunk apply  = decode_body

        total = T_layout * B + T_shape * (A - B - D) + n_chunks * D

    The context-GCN prologue rides inside B, overcounting each layout step by
    one GCN pass (<0.2% of the protocol total).  `state` may hold abstract
    ShapeDtypeStructs (jax.eval_shape of init) — nothing here executes.
    """
    import jax
    import jax.numpy as jnp

    from .models.echo_scene import EchoSceneModule

    args = (state.params, state.batch_stats, batch, jax.random.PRNGKey(0))

    def sample(gen):
        return lambda p, bs, b, k: sg.sample_fn(p, bs, b, k, gen_shape=gen,
                                                shape_rows=rows)

    lc = sg.cfg.layout_diffusion
    t_layout = lc.time_num if lc.sampler == "ddpm" else lc.sample_steps
    b_flops = _trace_flops(sample(False), *args)
    if b_flops is None:
        return None
    if not (gen_shape and sg.is_echoscene):
        return t_layout * b_flops

    a_flops = _trace_flops(sample(True), *args)
    sd = sg.cfg.shape_branch
    r, zc = sd.denoiser.image_size, sd.vqvae.embed_dim
    mp = -(-rows // decode_chunk) * decode_chunk
    n_chunks = mp // decode_chunk if mp > decode_chunk else 1
    chunk_rows = decode_chunk if mp > decode_chunk else mp
    z = jnp.zeros((chunk_rows, r, r, r, zc), jnp.float32)
    d_flops = _trace_flops(
        lambda p, bs, zz: sg.module_infer.apply(
            {"params": p, "batch_stats": bs}, zz,
            method=EchoSceneModule.decode_latent),
        state.params, state.batch_stats, z)
    if a_flops is None or d_flops is None:
        return None
    shape_body = max(a_flops - b_flops - d_flops, 0.0)
    return (t_layout * b_flops + sd.ddim_steps * shape_body
            + n_chunks * d_flops)


def chip_peak_flops() -> Optional[float]:
    """Peak dense bf16 MXU FLOP/s of the local chip (public spec sheets);
    None for unknown device kinds (e.g. the CPU emulation backend).

    MFU is reported against the bf16 peak by convention regardless of the
    program's compute dtype — an f32 step's MFU reads low against it, which
    is exactly the signal (bf16 is the hardware's native matmul rate)."""
    import jax

    kind = getattr(jax.devices()[0], "device_kind", "").lower()
    for pat, peak in (("v5 lite", 197e12), ("v5litepod", 197e12),
                      ("v5e", 197e12), ("v5p", 459e12),
                      ("v6 lite", 918e12), ("v6e", 918e12),
                      ("v4", 275e12), ("v3", 123e12), ("v2", 46e12)):
        if pat in kind:
            return peak
    return None


def time_generation(sg, state, batch, batch_scenes: int, n_iters: int = 3,
                    gen_shape: bool = True, return_flops: bool = False):
    """Compile + warm up, then average scenes/sec over `n_iters` calls.

    return_flops=True: returns (scenes_per_sec, flops_per_call) where
    flops_per_call is the trip-count-correct analytic count for ONE sample
    dispatch (batch_scenes scenes; sample_chain_flops — the raw compiled
    aggregate counts each chain's scan body only once) — the numerator of
    mfu_sample in bench.py.
    """
    import jax

    from .models.sgdiff import shape_row_capacity
    # exact row count (multiple=1): the bench compiles one variant anyway,
    # so it takes the full compaction win; serving keeps multiple=4 to bound
    # the number of distinct compiled chain variants
    rows = shape_row_capacity(batch, multiple=1)
    sample = jax.jit(
        lambda p, bs, b, k: sg.sample_fn(p, bs, b, k, gen_shape=gen_shape,
                                         shape_rows=rows))
    args = (state.params, state.batch_stats, batch, jax.random.PRNGKey(0))
    # AOT path: one explicit compile serves every timed call; the FLOP count
    # comes from cheap uncompiled lowerings (sample_chain_flops)
    compiled = sample.lower(*args).compile()
    flops = (sample_chain_flops(sg, state, batch, rows, gen_shape=gen_shape)
             if return_flops else None)
    out = compiled(*args)
    jax.block_until_ready(out)
    float(out["sizes"].sum())  # D2H readback — see timing note below

    t0 = time.perf_counter()
    acc = 0.0
    for i in range(n_iters):
        out = compiled(state.params, state.batch_stats, batch,
                       jax.random.PRNGKey(i + 1))
    # block_until_ready alone has proven unreliable for timing through the
    # tunneled TPU backend (microbenchmarks returned physically impossible
    # rates); a device-to-host readback of a result scalar cannot complete
    # before the computation has.
    jax.block_until_ready(out)
    acc += float(out["sizes"].sum())
    dt = (time.perf_counter() - t0) / n_iters
    assert acc == acc  # consume the readback (guards DCE)
    sps = batch_scenes / dt
    return (sps, flops) if return_flops else sps


def time_train_step(sg, state, batch, batch_scenes: int, k: int = 8,
                    rng_seed: int = 17, return_flops: bool = False):
    """Train-step scenes/sec/chip, measured as ONE dispatched lax.scan of `k`
    optimizer steps (host-driven per-step dispatch timing through the tunnel
    is too noisy to trust for ~200 ms programs — BASELINE.md r2 notes).

    return_flops=True: returns (scenes_per_sec, flops_per_step) — ONE
    fwd+bwd+AdamW optimizer step on batch_scenes scenes.  XLA's cost
    analysis counts the k-step scan's body exactly ONCE (pinned by
    tests/test_bench_helpers.py), so the program aggregate IS the per-step
    count (plus a negligible out-of-scan prologue) — do NOT divide by k.
    """
    import functools

    import jax
    import optax

    tx = sg.ensure_tx(state.params)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def run(carry, b, rngs):
        def body(c, rng):
            params, bstats, opt = c
            (loss, (new_bs, _)), grads = jax.value_and_grad(
                sg.loss_fn, has_aux=True)(params, bstats, b, rng)
            updates, new_opt = tx.update(grads, opt, params)
            new_params = optax.apply_updates(params, updates)
            return (new_params, new_bs, new_opt), loss
        return jax.lax.scan(body, carry, rngs)

    carry = (state.params, state.batch_stats, state.opt_state)
    rngs0 = jax.random.split(jax.random.PRNGKey(rng_seed), k)
    compiled = run.lower(carry, batch, rngs0).compile()
    flops = _compiled_flops(compiled)
    carry, losses = compiled(carry, batch, rngs0)  # warm (donates carry)
    jax.block_until_ready(carry)
    float(losses.sum())                            # D2H readback
    t0 = time.perf_counter()
    carry, losses = compiled(carry, batch, jax.random.split(
        jax.random.PRNGKey(rng_seed + 1), k))
    jax.block_until_ready(carry)
    acc = float(losses.sum())
    dt = time.perf_counter() - t0
    assert acc == acc
    sps = batch_scenes * k / dt
    return (sps, flops) if return_flops else sps
