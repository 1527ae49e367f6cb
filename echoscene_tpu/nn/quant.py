"""Int8 (W8A8) quantized convolution for the sampling path.

New TPU-native capability (no reference analog): v5e executes int8 MXU ops at
2x the bf16 rate, and the generation bench is conv-bound in the shape UNet
(BASELINE.md).  `Int8Conv` is parameter-compatible with `flax.linen.Conv`
(same 'kernel'/'bias' names, shapes and init), so the f32 training params are
shared unchanged; quantization happens at call time:

  * weights: symmetric per-OUTPUT-CHANNEL scales (kernel is loop-invariant in
    the sampling scans — XLA hoists the quantize),
  * activations: symmetric per-TENSOR dynamic scale (abs-max), recomputed
    every call,
  * conv accumulates in int32, dequantized with the product of both scales.

This is an OPT-IN experimental mode (`sample_dtype: int8`); the protocol
bench stays bf16.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import flax.linen as nn


def quantize_symmetric(x: jnp.ndarray, axes, eps: float = 1e-8):
    """abs-max int8 quantization over `axes`; returns (q, scale)."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=axes, keepdims=True)
    scale = jnp.maximum(amax, eps) / 127.0
    q = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    return q, scale


def _fixed_act_scale() -> Optional[float]:
    """Measurement hook (A/B only, not a product mode): when
    ECHOSCENE_INT8_FIXED_SCALE is set, activation quantization uses that
    constant scale instead of the dynamic abs-max.  This makes the quantize a
    pure elementwise epilogue XLA can fuse into the producing GN+SiLU pass —
    the upper bound for what a calibrated static-scale mode could win
    (VERDICT r2 next-#6: 'fold the GN+SiLU elementwise passes into the int8
    quant path').  Output values are wrong (clipping); timing is the point."""
    import os
    v = os.environ.get("ECHOSCENE_INT8_FIXED_SCALE")
    return float(v) if v else None


def quantize_act(x: jnp.ndarray):
    """Activation quantization: dynamic per-tensor abs-max, or the fixed-scale
    measurement hook."""
    fixed = _fixed_act_scale()
    if fixed is not None:
        scale = jnp.full((), fixed, jnp.float32)
        q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale),
                     -127, 127).astype(jnp.int8)
        return q, scale
    return quantize_symmetric(x, axes=None)


class Int8Conv(nn.Module):
    """Drop-in channel-last conv computing in int8 with int32 accumulation."""
    features: int
    kernel_size: Tuple[int, ...]
    strides: Tuple[int, ...]
    padding: Sequence[Tuple[int, int]]
    kernel_init: nn.initializers.Initializer = nn.initializers.lecun_normal()
    bias_init: nn.initializers.Initializer = nn.initializers.zeros
    out_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kshape = tuple(self.kernel_size) + (x.shape[-1], self.features)
        kernel = self.param("kernel", self.kernel_init, kshape)
        bias = self.param("bias", self.bias_init, (self.features,))

        # weights: per-output-channel (last axis) scales
        wq, w_scale = quantize_symmetric(kernel,
                                         axes=tuple(range(kernel.ndim - 1)))
        # activations: per-tensor dynamic scale (or the fixed-scale hook)
        xq, x_scale = quantize_act(x)

        rank = len(self.kernel_size)
        spatial = "DHW"[-rank:] if rank <= 3 else None
        assert spatial is not None, rank
        dn = jax.lax.conv_dimension_numbers(
            x.shape, kshape,
            (f"N{spatial}C", f"{spatial}IO", f"N{spatial}C"))
        y = jax.lax.conv_general_dilated(
            xq, wq, window_strides=tuple(self.strides),
            padding=list(self.padding), dimension_numbers=dn,
            preferred_element_type=jnp.int32)
        deq = (x_scale.reshape(()) *
               w_scale.reshape((1,) * (y.ndim - 1) + (self.features,)))
        y = y.astype(jnp.float32) * deq + bias.astype(jnp.float32)
        return y.astype(self.out_dtype)


def is_int8(dtype) -> bool:
    """True when the module-tree dtype carries the 'int8' conv sentinel."""
    return isinstance(dtype, str) and dtype == "int8"


def act_dtype(dtype):
    """Activation dtype for non-conv ops under the sentinel (bf16)."""
    return jnp.bfloat16 if is_int8(dtype) else dtype


class Int8Dense(nn.Module):
    """Drop-in nn.Dense computing in int8 with int32 accumulation.

    Same quantization scheme as Int8Conv: per-out-column weight scales,
    dynamic per-tensor activation scale.  Parameter names/shapes/init match
    nn.Dense so the f32 tree is shared unchanged.
    """
    features: int
    use_bias: bool = True
    kernel_init: nn.initializers.Initializer = nn.initializers.lecun_normal()
    bias_init: nn.initializers.Initializer = nn.initializers.zeros
    out_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kernel = self.param("kernel", self.kernel_init,
                            (x.shape[-1], self.features))
        wq, w_scale = quantize_symmetric(kernel, axes=(0,))
        xq, x_scale = quantize_act(x)
        y = jax.lax.dot_general(
            xq, wq, (((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        deq = x_scale.reshape(()) * w_scale.reshape(
            (1,) * (y.ndim - 1) + (self.features,))
        y = y.astype(jnp.float32) * deq
        if self.use_bias:
            bias = self.param("bias", self.bias_init, (self.features,))
            y = y + bias.astype(jnp.float32)
        return y.astype(self.out_dtype)


# Auto-naming compatibility: flax derives unnamed submodule scopes from the
# class name ("Conv_0", "Conv_1", ...).  Int8Conv/Int8Dense substitute for
# nn.Conv/nn.Dense inside modules whose other path creates the plain flax
# layer, so they must produce IDENTICAL parameter scopes — otherwise the
# shared f32 param tree doesn't resolve.  Rather than mutating
# Int8Conv.__name__ globally (which would rewrite reprs, tracebacks and jax
# stack annotations everywhere), purpose-built SUBCLASSES carry the scope
# name: flax reads the subclass's __name__ for auto-naming, while inherited
# methods keep their Int8* __qualname__ so debugging still shows which
# implementation ran.  Use these only at the nn.Conv/nn.Dense substitution
# sites (_conv in nn/blocks.py, dense below).
ScopedInt8Conv = type("Conv", (Int8Conv,), {"__doc__": "Int8Conv under the 'Conv' flax scope name."})
ScopedInt8Dense = type("Dense", (Int8Dense,), {"__doc__": "Int8Dense under the 'Dense' flax scope name."})


def dense(features: int, *, use_bias: bool = True, dtype=None, name=None,
          kernel_init=None, bias_init=None) -> nn.Module:
    """nn.Dense, or Int8Dense under the 'int8' sentinel."""
    kw = {}
    if kernel_init is not None:
        kw["kernel_init"] = kernel_init
    if bias_init is not None:
        kw["bias_init"] = bias_init
    if is_int8(dtype):
        return ScopedInt8Dense(features=features, use_bias=use_bias,
                               name=name, **kw)
    return nn.Dense(features, use_bias=use_bias, dtype=dtype, name=name, **kw)
