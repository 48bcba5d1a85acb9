# SPDX-License-Identifier: Apache-2.0
"""Dynamic A8W8 int8 backend — MXU-native integer matmul.

≙ the reference's experimental int8 path (`forward_aten_int8` /
`_get_int8_matrix` / `_matmul_int8`, `/root/reference/hqq/core/quantize.py:
1050-1073`), re-designed for TPU: the TPU MXU multiplies int8 operands at 2-4x
the bf16 rate, so instead of re-quantizing the dequantized weight on every
forward (what the reference does), the weight is converted ONCE at
`prepare_for_inference` time:

    w8 [out, in] int8, per-output-channel scale  sw = absmax_row / 127

and the activation is quantized dynamically per token:

    x8 = round(x / sx), sx = absmax_row(x) / 127
    y  = (x8 @ w8^T) * (sx * sw)          # int32 accumulation on the MXU

Per-channel/per-token scales (vs the reference's per-tensor) cost nothing on
TPU and keep the quality loss negligible.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import struct
from jax import Array

from ..core.quantize import dequantize
from ..nn.linear import QuantLinear

__all__ = ["Int8QuantLinear", "patch_quantlinear_to_int8", "dynamic_int8_matmul"]


def _quantize_int8_rows(w: Array) -> tuple[Array, Array]:
    """Symmetric int8 quantization with a per-row (leading-axis) scale."""
    sw = jnp.max(jnp.abs(w), axis=-1, keepdims=True) / 127.0
    sw = jnp.maximum(sw, 1e-8)
    w8 = jnp.round(w / sw).astype(jnp.int8)
    return w8, sw.astype(jnp.float32)


def dynamic_int8_matmul(x: Array, w8: Array, sw: Array) -> Array:
    """`x @ W^T` where W is int8 row-scaled: dynamic per-token activation
    quantization, int8 x int8 -> int32 on the MXU, fp rescale epilogue."""
    dtype = x.dtype
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1]).astype(jnp.float32)
    sx = jnp.max(jnp.abs(x2), axis=-1, keepdims=True) / 127.0
    sx = jnp.maximum(sx, 1e-8)
    x8 = jnp.round(x2 / sx).astype(jnp.int8)
    acc = jax.lax.dot_general(
        x8,
        w8,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out = acc.astype(jnp.float32) * sx * sw.reshape(1, -1)
    return out.reshape(*lead, w8.shape[0]).astype(dtype)


@struct.dataclass
class Int8QuantLinear:
    """Inference-prepared linear with a static int8 weight (per-out-channel
    scale) and dynamic per-token int8 activations."""

    w8: Array  # [out, in] int8
    sw: Array  # [out, 1] float32
    bias: Optional[Array] = None
    compute_dtype: Any = struct.field(pytree_node=False, default=jnp.bfloat16)

    @property
    def in_features(self) -> int:
        return self.w8.shape[1]

    @property
    def out_features(self) -> int:
        return self.w8.shape[0]

    def __call__(self, x: Array) -> Array:
        out = dynamic_int8_matmul(x.astype(self.compute_dtype), self.w8, self.sw)
        if self.bias is not None:
            out = out + self.bias.astype(out.dtype)
        return out

    def dequantize(self, dtype=None) -> Array:
        return (self.w8.astype(jnp.float32) * self.sw).astype(
            dtype or self.compute_dtype
        )


def patch_quantlinear_to_int8(layer: QuantLinear) -> Int8QuantLinear:
    """Convert a QuantLinear to the int8 backend (any nbits: the HQQ-dequanted
    weight is re-quantized symmetrically to int8 once, off the hot path)."""
    w = dequantize(layer.qweight, jnp.float32)
    w8, sw = _quantize_int8_rows(w)
    return Int8QuantLinear(
        w8=w8,
        sw=sw,
        bias=layer.bias,
        compute_dtype=layer.qweight.compute_dtype,
    )
