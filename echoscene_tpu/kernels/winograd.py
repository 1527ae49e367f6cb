"""Winograd F(2x2x2, 3x3x3) convolution as XLA matmuls.

The protocol generation chain is conv-bound: XLA's direct conv3d emitter
measured 108-128 TFLOP/s (55-65% of v5e bf16 peak) at the shape-UNet shapes,
and two hand-written Pallas direct-conv kernels lost to it (post-mortem
in BASELINE.md round-2 conv-ceiling follow-ups).  Winograd attacks the FLOPs instead of the emitter:
F(2,3) per dimension computes each 2x2x2 output tile from a 4x4x4 input tile
with 64 multiplies instead of 8*27 = 216 — a 3.375x MAC reduction — and all
three stages (input transform, per-position channel matmul, inverse
transform) are MXU-shaped matmuls.

Math (Lavin & Gray, "Fast Algorithms for Convolutional Neural Networks",
arXiv:1509.09308; correlation convention, matching lax.conv / nn.Conv):

    Y = A^T [ (G g G^T) . (B^T d B) ] A        per dim, tensor-product in 3D

with the F(2,3) matrices

    B^T = [[1,0,-1,0],[0,1,1,0],[0,-1,1,0],[0,1,0,-1]]
    G   = [[1,0,0],[1/2,1/2,1/2],[1/2,-1/2,1/2],[0,0,1]]
    A^T = [[1,1,1,0],[0,1,-1,-1]]

Numerics: B and A entries are {0, +-1}, so the data-side transforms are pure
sums/differences — exact in any dtype up to f32-accumulation order.  G has
1/2 entries; the weight transform runs in f32 once (it is loop-invariant in
the sampling scan, so XLA hoists it out of the 100-step chain).  The only
added rounding vs direct bf16 conv is the bf16 cast of the transformed input
tiles and of the per-position products — measured end-to-end via the SDF
divergence check in tests/test_winograd.py.

Behavioral reference for the op being replaced: the 3x3x3 stride-1 SAME
convolutions of the shape UNet / VQ-VAE decoder
(/root/reference/model/networks/diffusion_shape/openai_model_3d.py:202-314,
ldm_diffusion_util.py:241-273 conv_nd).

STATUS — measured on v5e (scripts/bench_winograd.py, in-scan chains), this
XLA formulation LOSES to the direct conv emitter at every shape-UNet level:

    16^3 C=224: direct 3.91 ms (116 TF/s)  winograd 25.4 ms  (0.15x)
     8^3 C=448: direct 1.95 ms (116 TF/s)  winograd  7.31 ms (0.27x)
     4^3 C=672: direct 0.79 ms ( 81 TF/s)  winograd  1.46 ms (0.54x)

The MAC reduction is real but the formulation is HBM-bound: the overlapping
4^3 tiles materialise an 8x-expanded activation (601 MB at the 16^3 level),
and the Winograd-domain v/m tensors add two more full-size round-trips —
~4 GB of traffic against direct conv's ~0.3 GB.  At 819 GB/s that floor
alone (~5 ms) exceeds direct conv's total.  Winograd only wins here if the
tile extraction + transforms stay VMEM-resident (a fused Pallas kernel);
`sample_conv='winograd'` remains available for future toolchains, default
stays 'direct'.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

_BT = np.array([[1, 0, -1, 0],
                [0, 1, 1, 0],
                [0, -1, 1, 0],
                [0, 1, 0, -1]], np.float32)
_G = np.array([[1, 0, 0],
               [0.5, 0.5, 0.5],
               [0.5, -0.5, 0.5],
               [0, 0, 1]], np.float32)
_AT = np.array([[1, 1, 1, 0],
                [0, 1, -1, -1]], np.float32)


@functools.lru_cache(None)
def _mats_np():
    b3 = np.kron(np.kron(_BT, _BT), _BT)    # (64, 64)
    g3 = np.kron(np.kron(_G, _G), _G)       # (64, 27)
    a3 = np.kron(np.kron(_AT, _AT), _AT)    # (8, 64)
    return b3, g3, a3


def _mats():
    # NOTE: only the numpy arrays are cached; jnp conversion must happen per
    # call — caching a jnp array created inside a jit trace leaks that trace's
    # tracer into every later jit (UnexpectedTracerError on the 2nd program).
    b3, g3, a3 = _mats_np()
    return jnp.asarray(b3), jnp.asarray(g3), jnp.asarray(a3)


def transform_weights(w: jnp.ndarray) -> jnp.ndarray:
    """(3,3,3,C,K) -> (64, C, K) f32 Winograd-domain weights (U = G3 w)."""
    _, g3, _ = _mats()
    c, k = w.shape[3], w.shape[4]
    return jnp.einsum("pq,qck->pck", g3,
                      w.astype(jnp.float32).reshape(27, c, k))


def _extract_tiles(xp: jnp.ndarray, td: int, th: int, tw: int) -> jnp.ndarray:
    """xp: (B, 2*td+2, 2*th+2, 2*tw+2, C) zero-padded input.

    Returns (B, td, th, tw, 4, 4, 4, C): overlapping 4^3 tiles at stride 2.
    Built from 4 strided slices per dim (8x data expansion — the XLA
    formulation pays this in HBM; a fused Pallas version would not).
    """
    def split(x, axis, t):
        parts = []
        for a in range(4):
            idx = [slice(None)] * x.ndim
            idx[axis] = slice(a, a + 2 * t, 2)
            parts.append(x[tuple(idx)])
        return jnp.stack(parts, axis=x.ndim)   # new minor-most axis len 4
    x = split(xp, 1, td)        # (B, td, Hp, Wp, C, 4)
    x = split(x, 2, th)         # (B, td, th, Wp, C, 4, 4)
    x = split(x, 3, tw)         # (B, td, th, tw, C, 4, 4, 4)
    return jnp.moveaxis(x, 4, 7)   # (B, td, th, tw, 4, 4, 4, C)


def winograd_conv3d(x: jnp.ndarray, w: jnp.ndarray,
                    b: jnp.ndarray | None = None,
                    u: jnp.ndarray | None = None) -> jnp.ndarray:
    """SAME stride-1 3x3x3 conv, channel-last.

    x: (B, D, H, W, C) with D, H, W even; w: (3,3,3,C,K); returns
    (B, D, H, W, K) in x.dtype.  Pass `u` (from transform_weights) to skip
    the weight transform.
    """
    b3, _, a3 = _mats()
    bs, d, h, wd, c = x.shape
    k = w.shape[4]
    td, th, tw = d // 2, h // 2, wd // 2
    if u is None:
        u = transform_weights(w)
    u = u.astype(x.dtype)

    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    tiles = _extract_tiles(xp, td, th, tw)
    rows = bs * td * th * tw
    tiles = tiles.reshape(rows, 64, c)

    # input transform: exact sums/differences (B entries in {0, +-1});
    # f32 accumulation, bf16 result
    v = jnp.einsum("pq,rqc->prc", b3.astype(x.dtype), tiles,
                   preferred_element_type=jnp.float32).astype(x.dtype)
    # 64 per-position channel matmuls — the MAC-reduced stage
    m = jnp.einsum("prc,pck->prk", v, u,
                   preferred_element_type=jnp.float32).astype(x.dtype)
    # inverse transform (A entries in {0, +-1}), f32 accumulation
    y = jnp.einsum("op,prk->rok", a3.astype(x.dtype), m,
                   preferred_element_type=jnp.float32)

    y = y.reshape(bs, td, th, tw, 2, 2, 2, k)
    y = y.transpose(0, 1, 4, 2, 5, 3, 6, 7).reshape(bs, d, h, wd, k)
    if b is not None:
        y = y + b.astype(jnp.float32)
    return y.astype(x.dtype)
