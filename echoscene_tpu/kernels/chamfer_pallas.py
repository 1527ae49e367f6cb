"""Pallas chamfer / nearest-neighbor distance kernel.

TPU-native replacement for the reference's CUDA chamfer extension
(extension/old_chamfer/chamfer.cu:12-148: shared-memory tiled brute force).
The einsum formulation materialises a (B, N, M) distance tensor in HBM
(100 MB per 5k x 5k pair); this kernel streams one (block_n, M) score tile
through VMEM per grid step and reduces to the running min — HBM traffic drops
to O(N + M) per pair.

Point coordinates are zero-padded from 3 to a 128-lane feature dim; the
squared-distance identity d = |a|^2 + |b|^2 - 2 a.b is exact under zero
padding.  Point-count padding uses +inf-norm sentinel rows on B so padded
targets never win the min; padded query rows are sliced off.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128


def _nn_kernel(a_ref, b_ref, bsq_ref, o_ref):
    a = a_ref[0]          # (Bn, 128)
    b = b_ref[0]          # (M, 128)
    bsq = bsq_ref[0]      # (1, M)  |b|^2 with +inf on padded rows
    asq = jnp.sum(a * a, axis=-1, keepdims=True)           # (Bn, 1)
    ab = jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    d = asq + bsq - 2.0 * ab
    o_ref[0] = jnp.min(d, axis=1)


def _round_up(x, m):
    return (x + m - 1) // m * m


@functools.partial(jax.jit, static_argnames=("block_n",))
def nn_distance_oneway(a: jnp.ndarray, b: jnp.ndarray,
                       block_n: int = 512) -> jnp.ndarray:
    """a: (B, N, 3), b: (B, M, 3) -> (B, N) squared NN distance a->b."""
    B, n, _ = a.shape
    m = b.shape[1]
    n_pad = _round_up(n, block_n)
    m_pad = _round_up(m, 8)

    ap = jnp.pad(a, ((0, 0), (0, n_pad - n), (0, _LANES - 3)))
    bp = jnp.pad(b, ((0, 0), (0, m_pad - m), (0, _LANES - 3)))
    bsq = jnp.sum(bp * bp, axis=-1)
    if m_pad > m:
        pad_mask = jnp.arange(m_pad) >= m
        bsq = jnp.where(pad_mask[None, :], jnp.inf, bsq)
    bsq = bsq[:, None, :]                                   # (B, 1, M)

    grid = (B, n_pad // block_n)
    out = pl.pallas_call(
        _nn_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_n, _LANES), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m_pad, _LANES), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, m_pad), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_n), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, n_pad), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * n * m_pad * _LANES,
            bytes_accessed=B * (n + m) * _LANES * 4,
            transcendentals=0),
    )(ap, bp, bsq)
    return jnp.maximum(out[:, :n], 0.0)


def chamfer_pallas(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(B,) chamfer: mean sq NN dist both ways (compute_mmd_cov_1nn.py:88)."""
    da = nn_distance_oneway(a, b)
    db = nn_distance_oneway(b, a)
    return da.mean(axis=1) + db.mean(axis=1)
