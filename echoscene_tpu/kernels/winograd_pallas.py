"""Fused Pallas Winograd F(2x2x2, 3x3x3) convolution.

The XLA-matmul Winograd formulation (kernels/winograd.py) loses to the
direct conv emitter at every shape-UNet level because the Winograd-domain
tensors round-trip HBM: the overlapping 4^3 tiles are an 8x-expanded copy of
the activation and the V/M tensors add two more full passes (~4 GB traffic
vs ~0.3 GB for direct conv at the 16^3x224 level).  This kernel keeps the
whole pipeline VMEM-resident and fuses the input transform into the channel
matmuls — the Winograd-domain V tensor is never materialised anywhere, not
even in VMEM scratch (a v1 that staged V in scratch spent more time on the
store/load relayouts than on the matmuls):

    HBM -> x z-slabs -> per position p in the (a, b, g) transform loop:
               V_p = B^T d B slice   (VPU adds, registers)
               M_p = V_p @ U[p]      (MXU, f32 accumulate)
               y[o] +-= M_p          (A^T as signed VPU accumulation)
        -> 8 per-offset output arrays -> HBM

HBM traffic is read-x-once + read-U-once + write-y-once while the MACs drop
3.375x vs direct conv (the K lane padding to 128 multiples costs 14%, so
2.95x effective).

Key layout choices (all forced by Mosaic tiling — the last two dims of every
block live in (sublane x lane) tiles):
  * channels stay the lane dimension end to end;
  * the W axis is parity-pre-split in XLA (x_even = x[..., 0::2, :]) so the
    in-kernel x-direction transform uses only unit-offset sublane slices —
    never stride-2 sublane gathers;
  * the z window of a cell (2*nz+2 planes, overlapping the next cell by 2)
    is expressed as TWO BlockSpec refs over the same array with block index
    maps i and i+1 — Pallas cannot express overlapping blocks directly;
  * each of the 8 output interleave offsets (oz, oy, ox) gets its own output
    array (B, TD, TH, TW, K); the host-side interleave to (B, D, H, W, K) is
    one small XLA transpose;
  * K blocks must be lane multiples (128) — K is zero-padded and the extra
    columns sliced off on the host.

The input transform is exact per dim: B^T rows are {0, +-1} so each
Winograd-domain value is a +-sum of <= 8 inputs, computed in f32 and cast to
bf16 for the MXU — the same rounding story as the XLA formulation, parity
tested against it and lax.conv in tests/test_winograd_pallas.py.

Behavioral reference: the stride-1 SAME 3x3x3 convolutions of the shape
UNet (/root/reference/model/networks/diffusion_shape/openai_model_3d.py:
202-314); the UNet resamples only the inner two dims, so the three levels
run at (16,16,16)x224, (16,8,8)x448, (16,4,4)x672.

STATUS — measured on v5e (in-scan chains, scripts/bench_winograd_pallas.py),
BOTH Pallas variants lose narrowly to XLA's direct conv emitter at the
flagship shapes and are therefore NOT wired into the model (the conv
dispatch keeps 'direct'):

    (16,16,16)x224: direct 4.3 ms | 3D fused 4.4-4.7 ms | 2.5D 4.9 ms
    (16, 8, 8)x448: direct 3.9 ms | 3D (C-split)  ~4.8 ms | 2.5D 4.4 ms
    (16, 4, 4)x672: direct 2.5 ms | both slower

Why, despite 2.95x (3D, after K-pad) / 2.0x (2.5D) fewer MACs:
  * the MXU is weight-load bound at small row counts: each Winograd
    position's (C, kb) weight matrix serves only T = 64-256 matmul rows per
    load (VMEM caps T), while XLA's direct conv streams ~170k rows per
    weight tile — stage-isolated probes measured the position-matmuls at
    ~35 TF/s vs the emitter's 116 TF/s;
  * the B^T transforms are VPU work with poor op shapes (hundreds of small
    slice/add ops per cell); a stage-isolated transform-only kernel cost as
    much as the full direct conv;
  * fixes that helped (fusing V into the dots, bf16 transforms, separable
    inverse with 136 signed adds, kk-innermost grids with persistent
    scratch, the 2.5D reformulation with 16 positions and T=256) moved the
    total from 0.15x (pure-XLA formulation) to 0.92x — still short.

Kept as a tested, parity-verified reference for future toolchains (a Mosaic
with batched-matmul weight pipelining or a bigger-VMEM part changes the
economics).
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .winograd import transform_weights, _mats_np


@functools.lru_cache(None)
def _at2_signs():
    """(a, b) -> ((o1o2, sign), ...) for the y/z inverse-transform pair
    (A^T kron A^T)[o1o2, a*4+b] != 0; the x-dim inverse is applied first
    (n0 = m0+m1+m2, n1 = m1-m2-m3), making the full A^T kron^3 separable
    with 136 signed adds instead of 216."""
    at = np.array([[1, 1, 1, 0], [0, 1, -1, -1]], np.float32)
    a2 = np.kron(at, at)           # (4, 16)
    table = {}
    for a in range(4):
        for b_ in range(4):
            col = a * 4 + b_
            table[(a, b_)] = tuple(
                (o, int(a2[o, col])) for o in range(4) if a2[o, col] != 0)
    return table


def _bt_pair(e0, o0, e1, o1):
    """F(2,3) B^T applied along one dim given the even/odd elements of the
    4-window [x0, x1, x2, x3] = [e0, o0, e1, o1]: returns the 4 transformed
    values (x0-x2, x1+x2, x2-x1, x1-x3)."""
    return (e0 - e1, o0 + e1, e1 - o0, o0 - o1)


def _kernel(xea_ref, xeb_ref, xoa_ref, xob_ref, u_ref, *refs,
            nz: int, th: int, tw: int):
    """One grid cell: `bb` batch rows x `nz` z-slabs x all (ty, tx) tiles of
    one output-channel block.

    x refs: (bb, 2nz | 2, Hp, Wpar, C) — see the wrapper for the blocking;
    u_ref: (64, C, kb); out_refs: 8 x (bb, nz, th, tw, kb);
    y_scr: (8, T, kb) f32 with T = bb*nz*th*tw.
    """
    out_refs, (y_scr,) = refs[:8], refs[8:]
    bb = xea_ref.shape[0]
    c = xea_ref.shape[-1]
    kb = u_ref.shape[-1]
    t_rows = bb * nz * th * tw
    signs2 = _at2_signs()

    def plane(ref_a, ref_b, i):
        # plane i of the cell's z window without materialising a concat;
        # all transform arithmetic stays bf16 (the MXU consumes bf16 anyway
        # and B^T sums are {0, +-1} — same rounding class as the bf16 cast)
        return ref_a[:, i] if i < 2 * nz else ref_b[:, i - 2 * nz]

    # z-dim transform for every slab j: 4 a-planes per (j, parity)
    a_planes = []                           # [j][a] -> (even, odd) planes
    for j in range(nz):
        p_e = [plane(xea_ref, xeb_ref, 2 * j + i) for i in range(4)]
        p_o = [plane(xoa_ref, xob_ref, 2 * j + i) for i in range(4)]
        ae = _bt_pair(*p_e)                 # (bb, Hp, We, C) each
        ao = _bt_pair(*p_o)
        a_planes.append(list(zip(ae, ao)))

    y_zero = jnp.zeros_like(y_scr[0])
    for o in range(8):
        y_scr[o] = y_zero

    for a in range(4):
        for b_ in range(4):
            # y-dim transform per slab, then x-dim; fused straight into the
            # channel matmuls so V is never materialised
            qs = []
            for j in range(nz):
                pe, po = a_planes[j][a]
                pe = pe.reshape(bb, th + 1, 2, tw + 1, c)
                po = po.reshape(bb, th + 1, 2, tw + 1, c)
                ye0, yo0 = pe[:, :, 0], pe[:, :, 1]   # (bb, th+1, tw+1, C)
                ye1, yo1 = po[:, :, 0], po[:, :, 1]
                be = _bt_pair(ye0[:, :th], yo0[:, :th],
                              ye0[:, 1:], yo0[:, 1:])[b_]
                bo = _bt_pair(ye1[:, :th], yo1[:, :th],
                              ye1[:, 1:], yo1[:, 1:])[b_]
                qs.append((be, bo))
            ms = []
            for g_ in range(4):
                parts = []
                for j in range(nz):
                    qe, qo = qs[j]                    # (bb, th, tw+1, C)
                    g = _bt_pair(qe[:, :, :tw], qo[:, :, :tw],
                                 qe[:, :, 1:], qo[:, :, 1:])[g_]
                    parts.append(g.reshape(bb, 1, th * tw, c))
                # row order (bb, nz, ty*tx) matches the output block layout
                v_p = (parts[0] if nz == 1
                       else jnp.concatenate(parts, axis=1)).reshape(t_rows, c)
                p = a * 16 + b_ * 4 + g_
                ms.append(jax.lax.dot_general(
                    v_p.astype(jnp.bfloat16), u_ref[p],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32))     # (T, kb)
            # separable inverse: x-dim pair first, then the (z, y) signs
            n0 = ms[0] + ms[1] + ms[2]
            n1 = ms[1] - ms[2] - ms[3]
            for o12, s in signs2[(a, b_)]:
                o0, o1 = 2 * o12, 2 * o12 + 1
                y_scr[o0] = (y_scr[o0] + n0) if s > 0 else (y_scr[o0] - n0)
                y_scr[o1] = (y_scr[o1] + n1) if s > 0 else (y_scr[o1] - n1)

    for o in range(8):
        out_refs[o][...] = (
            y_scr[o].reshape(bb, nz, th, tw, kb).astype(out_refs[o].dtype))


def _tile_bytes(shape, dtype_bytes: int) -> int:
    """VMEM bytes of a block after Mosaic (sublane, lane) tile padding."""
    sub = {1: 32, 2: 16, 4: 8}[dtype_bytes]
    dims = list(shape)
    dims[-1] = -(-dims[-1] // 128) * 128
    if len(dims) >= 2:
        dims[-2] = -(-dims[-2] // sub) * sub
    n = 1
    for d_ in dims:
        n *= d_
    return n * dtype_bytes


def _estimate_vmem(bb, nz, th, tw, c, kb, hp, wpar, u_dbuf: bool) -> int:
    t_rows = bb * nz * th * tw
    x_a = _tile_bytes((bb, 2 * nz, hp, wpar, c), 2)
    x_b = _tile_bytes((bb, 2, hp, wpar, c), 2)
    u = _tile_bytes((64, c, kb), 2) * (2 if u_dbuf else 1)
    y = _tile_bytes((8, t_rows, kb), 4)
    outs = 8 * _tile_bytes((bb, nz, th, tw, kb), 2) * 2
    # transform temporaries: the 8 f32 a-planes per slab (Mosaic keeps them
    # live across the (a, b, g) loops) + slack for b/g-stage temps
    temps = 10 * nz * _tile_bytes((bb, hp, wpar, c), 4)
    return 2 * 2 * (x_a + x_b) + u + y + outs + temps


def _pick_geometry(td, th, tw, c, kpad, hp, wpar,
                   budget: int = 15 * 1024 * 1024):
    """(bb, nz, kb) maximizing matmul-row count then kb under the VMEM cap.

    Mosaic requires the K block to be a multiple of 128 (or the whole padded
    array); whole-kpad U blocks are single-buffered (their index map is
    constant), smaller kb blocks are revisited per grid step and double
    buffered.  Transforms are recomputed per K block (V is fused, never
    stored), so fewer K blocks beats more matmul rows at equal VMEM.
    """
    cands = []
    for bb in (1, 2, 4, 8):
        for nz in range(td, 0, -1):
            if td % nz:
                continue
            for kb in [kpad] + [k for k in range(128, kpad, 128)
                                if kpad % k == 0]:
                est = _estimate_vmem(bb, nz, th, tw, c, kb, hp, wpar,
                                     u_dbuf=(kb != kpad))
                if est > budget:
                    continue
                t_rows = bb * nz * th * tw
                if t_rows > 256:
                    continue
                score = (-(kpad // kb), min(t_rows, 128), kb)
                cands.append((score, (bb, nz, kb)))
    if not cands:
        return None
    return max(cands)[1]


def winograd_conv3d_pallas(x: jnp.ndarray, w: jnp.ndarray,
                           b: jnp.ndarray | None = None,
                           u: jnp.ndarray | None = None,
                           *, geometry=None,
                           interpret: bool = False) -> jnp.ndarray:
    """SAME stride-1 3x3x3 conv via a fused Pallas Winograd kernel.

    x: (B, D, H, W, C) with even D, H, W; w: (3,3,3,C,K).  Returns
    (B, D, H, W, K) in x.dtype.  Pass `u` (transform_weights(w)) to skip the
    weight transform (it is loop-invariant in the sampling scan).
    """
    bs, d, h, wd, c = x.shape
    k = w.shape[4]
    td, th, tw = d // 2, h // 2, wd // 2
    if u is None:
        u = transform_weights(w)                 # (64, C, K) f32
    u = u.astype(jnp.bfloat16)
    kpad = -(-k // 128) * 128                    # Mosaic lane-dim granularity
    if kpad > k:
        u = jnp.pad(u, ((0, 0), (0, 0), (0, kpad - k)))

    wpar = (wd + 2) // 2
    hp = h + 2
    geo = geometry or _pick_geometry(td, th, tw, c, kpad, hp, wpar)
    if geo is None:
        # input channels too wide for VMEM: split the contraction in XLA —
        # conv(x, w) == conv(x[..., :c2], w[:c2]) + conv(x[..., c2:], w[c2:])
        if c < 16:
            raise ValueError(
                f"no Winograd cell geometry fits VMEM for shape {x.shape} "
                f"K={k} — use the direct conv path")
        c2 = -(-c // 2 // 8) * 8                 # keep sublane-friendly
        y0 = winograd_conv3d_pallas(x[..., :c2], w[:, :, :, :c2], None,
                                    interpret=interpret)
        y1 = winograd_conv3d_pallas(x[..., c2:], w[:, :, :, c2:], None,
                                    interpret=interpret)
        y = (y0.astype(jnp.float32) + y1.astype(jnp.float32))
        if b is not None:
            y = y + b.astype(jnp.float32)
        return y.astype(x.dtype)
    bb, nz, kb = geo
    t_rows = bb * nz * th * tw

    bp = -(-bs // bb) * bb
    if bp > bs:
        x = jnp.concatenate(
            [x, jnp.zeros((bp - bs,) + x.shape[1:], x.dtype)], 0)

    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    xe = xp[:, :, :, 0::2, :]                    # (Bp, D+2, H+2, (W+2)/2, C)
    xo = xp[:, :, :, 1::2, :]

    n_cells_z = td // nz
    grid = (bp // bb, n_cells_z, kpad // kb)

    def in_map_a(ib, iz, kk):
        return (ib, iz, 0, 0, 0)

    def in_map_b(ib, iz, kk):
        # the 2 planes after the slab: z-blocks of size 2 -> index nz*iz + nz
        return (ib, nz * iz + nz, 0, 0, 0)

    x_spec_a = pl.BlockSpec((bb, 2 * nz, hp, wpar, c), in_map_a,
                            memory_space=pltpu.VMEM)
    x_spec_b = pl.BlockSpec((bb, 2, hp, wpar, c), in_map_b,
                            memory_space=pltpu.VMEM)
    u_spec = pl.BlockSpec((64, c, kb), lambda ib, iz, kk: (0, 0, kk),
                          memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((bb, nz, th, tw, kb),
                            lambda ib, iz, kk: (ib, iz, 0, 0, kk),
                            memory_space=pltpu.VMEM)
    out_shape = [jax.ShapeDtypeStruct((bp, td, th, tw, kpad), x.dtype)
                 for _ in range(8)]

    kern = functools.partial(_kernel, nz=nz, th=th, tw=tw)
    flops_mm = 2 * bp * td * th * tw * 64 * c * kpad
    outs = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[x_spec_a, x_spec_b, x_spec_a, x_spec_b, u_spec],
        out_specs=[out_spec] * 8,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((8, t_rows, kb), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops_mm,
            bytes_accessed=(2 * bp * d * h * wd * (c + k)
                            + 2 * 64 * c * kpad * (bp // bb) * n_cells_z),
            transcendentals=0),
        interpret=interpret,
    )(xe, xe, xo, xo, u)

    # interleave the 8 offset grids: (B, TD, TH, TW, K) x (oz, oy, ox)
    y = jnp.stack(outs, axis=1).reshape(bp, 2, 2, 2, td, th, tw, kpad)
    y = y.transpose(0, 4, 1, 5, 2, 6, 3, 7).reshape(bp, d, h, wd, kpad)
    y = y[:bs, :, :, :, :k]
    if b is not None:
        y = (y.astype(jnp.float32) + b.astype(jnp.float32)).astype(x.dtype)
    return y


# ---------------------------------------------------------------------------
# 2.5D variant: Winograd F(2,3)^2 on (H, W), direct 3-tap accumulation on D.
#
# The full 3D kernel above is weight-load bound on the MXU: its 64 Winograd
# positions each get a distinct (C, kb) weight matrix but only T<=128 matmul
# rows, so the systolic array spends more cycles loading weights than
# computing (measured ~35 TF/s effective).  Decomposing the z dimension as a
# plain 3-tap accumulation leaves 16 Winograd positions x 3 z-taps whose
# matmuls see T = PZ*TH*TW = 256 rows each — enough to hide the weight
# loads — while still cutting MACs 2.25x vs direct conv.  The 2D transforms
# of each input plane are computed once into VMEM scratch and reused by the
# three output planes that consume the plane.
# ---------------------------------------------------------------------------

@functools.lru_cache(None)
def _at2d_signs():
    """Per 2D position p: ((o, sign), ...) for (A^T kron A^T)[o, p] != 0."""
    at = np.array([[1, 1, 1, 0], [0, 1, -1, -1]], np.float32)
    a2 = np.kron(at, at)           # (4, 16)
    return tuple(tuple((o, int(a2[o, p])) for o in range(4) if a2[o, p] != 0)
                 for p in range(16))


def transform_weights_2d(w: jnp.ndarray) -> jnp.ndarray:
    """(3,3,3,C,K) -> (16, 3, C, K) f32: per z-tap 2D Winograd weights
    (U2[:, dz] = (G kron G) w[dz])."""
    g = np.array([[1, 0, 0], [0.5, 0.5, 0.5], [0.5, -0.5, 0.5], [0, 0, 1]],
                 np.float32)
    g2 = jnp.asarray(np.kron(g, g))                   # (16, 9)
    c, k = w.shape[3], w.shape[4]
    w2 = w.astype(jnp.float32).reshape(3, 9, c, k)    # (dz, 9, C, K)
    return jnp.einsum("pq,dqck->pdck", g2, w2)


def _kernel25(xea_ref, xeb_ref, xoa_ref, xob_ref, u_ref, *refs,
              pz: int, th: int, tw: int):
    """One grid cell: one batch row x `pz` output z-planes x one K block.

    x refs: (1, pz | 2, Hp, Wpar, C) over the z-padded input; u_ref:
    (16, 3, C, kb); out_refs: 4 x (1, pz, th, tw, kb);
    v_scr: (16, pz+2, th*tw, C) bf16; y_scr: (4, pz*th*tw, kb) f32.
    """
    out_refs, (v_scr, y_scr) = refs[:4], refs[4:]
    c = xea_ref.shape[-1]
    kb = u_ref.shape[-1]
    t_rows = pz * th * tw
    signs = _at2d_signs()

    @pl.when(pl.program_id(2) == 0)
    def _transform():
        for i in range(pz + 2):
            pe = (xea_ref[0, i] if i < pz else xeb_ref[0, i - pz])
            po = (xoa_ref[0, i] if i < pz else xob_ref[0, i - pz])
            pe = pe.reshape(th + 1, 2, tw + 1, c)
            po = po.reshape(th + 1, 2, tw + 1, c)
            ye0, yo0 = pe[:, 0], pe[:, 1]             # (th+1, tw+1, C)
            ye1, yo1 = po[:, 0], po[:, 1]
            bes = _bt_pair(ye0[:th], yo0[:th], ye0[1:], yo0[1:])
            bos = _bt_pair(ye1[:th], yo1[:th], ye1[1:], yo1[1:])
            for b_ in range(4):
                qe, qo = bes[b_], bos[b_]             # (th, tw+1, C)
                gs = _bt_pair(qe[:, :tw], qo[:, :tw], qe[:, 1:], qo[:, 1:])
                for g_ in range(4):
                    v_scr[b_ * 4 + g_, i] = (
                        gs[g_].reshape(th * tw, c).astype(v_scr.dtype))

    y_zero = jnp.zeros_like(y_scr[0])
    for o in range(4):
        y_scr[o] = y_zero

    for p in range(16):
        m = None
        for dz in range(3):
            # output planes [0, pz) read input planes [dz, dz+pz)
            rows = v_scr[p, dz:dz + pz].reshape(t_rows, c)
            d = jax.lax.dot_general(rows, u_ref[p, dz],
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            m = d if m is None else m + d
        for o, s in signs[p]:
            y_scr[o] = (y_scr[o] + m) if s > 0 else (y_scr[o] - m)

    for o in range(4):
        out_refs[o][...] = (
            y_scr[o].reshape(1, pz, th, tw, kb).astype(out_refs[o].dtype))


def winograd_conv25d_pallas(x: jnp.ndarray, w: jnp.ndarray,
                            b: jnp.ndarray | None = None,
                            u2: jnp.ndarray | None = None,
                            *, pz: int = 4, kb: int | None = None,
                            interpret: bool = False) -> jnp.ndarray:
    """SAME stride-1 3x3x3 conv: 2D Winograd on (H, W), 3-tap accumulate on D.

    x: (B, D, H, W, C) with even H, W and D divisible by `pz`; w:
    (3,3,3,C,K).  Pass `u2` (transform_weights_2d(w)) to skip the weight
    transform.
    """
    bs, d, h, wd, c = x.shape
    k = w.shape[4]
    th, tw = h // 2, wd // 2
    if u2 is None:
        u2 = transform_weights_2d(w)             # (16, 3, C, K)
    u2 = u2.astype(jnp.bfloat16)
    kpad = -(-k // 128) * 128
    if kpad > k:
        u2 = jnp.pad(u2, ((0, 0), (0, 0), (0, 0), (0, kpad - k)))
    if kb is None:
        kb = 128 if 16 * 3 * c * kpad * 2 > 6 * 1024 * 1024 else kpad

    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    xe = xp[:, :, :, 0::2, :]                    # (B, D+2, H+2, (W+2)/2, C)
    xo = xp[:, :, :, 1::2, :]
    wpar = (wd + 2) // 2
    hp = h + 2

    n_cells_z = d // pz
    grid = (bs, n_cells_z, kpad // kb)

    x_spec_a = pl.BlockSpec((1, pz, hp, wpar, c),
                            lambda ib, iz, kk: (ib, iz, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    x_spec_b = pl.BlockSpec((1, 2, hp, wpar, c),
                            lambda ib, iz, kk: (ib, (pz // 2) * iz + pz // 2,
                                                0, 0, 0),
                            memory_space=pltpu.VMEM)
    u_spec = pl.BlockSpec((16, 3, c, kb), lambda ib, iz, kk: (0, 0, 0, kk),
                          memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, pz, th, tw, kb),
                            lambda ib, iz, kk: (ib, iz, 0, 0, kk),
                            memory_space=pltpu.VMEM)
    out_shape = [jax.ShapeDtypeStruct((bs, d, th, tw, kpad), x.dtype)
                 for _ in range(4)]

    kern = functools.partial(_kernel25, pz=pz, th=th, tw=tw)
    outs = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[x_spec_a, x_spec_b, x_spec_a, x_spec_b, u_spec],
        out_specs=[out_spec] * 4,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((16, pz + 2, th * tw, c), jnp.bfloat16),
            pltpu.VMEM((4, pz * th * tw, kb), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * bs * d * th * tw * 16 * 3 * c * kpad,
            bytes_accessed=2 * bs * d * h * wd * (c + k),
            transcendentals=0),
        interpret=interpret,
    )(xe, xe, xo, xo, u2)

    # interleave the 4 offset grids (oy, ox)
    y = jnp.stack(outs, axis=1).reshape(bs, 2, 2, d, th, tw, kpad)
    y = y.transpose(0, 3, 4, 1, 5, 2, 6).reshape(bs, d, h, wd, kpad)
    y = y[..., :k]
    if b is not None:
        y = (y.astype(jnp.float32) + b.astype(jnp.float32)).astype(x.dtype)
    return y
