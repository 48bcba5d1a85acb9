# SPDX-License-Identifier: Apache-2.0
"""Quantized linear layer — the TPU-native `HQQLinear` equivalent.

The reference (`/root/reference/hqq/core/quantize.py:387-1073`) is a mutable
nn.Module whose forward method is swapped per backend and whose autograd
Functions route gradients to inputs/bias only. Here the layer is an immutable
pytree (`QuantLinear`) and the forward is a pure function; the
memory-efficient backward (re-dequantize instead of saving the dequantized
weight, ≙ `HQQMatmulNoCacheMul`, ref `core/quantize.py:322-352`) is a
`jax.custom_vjp`. Backends are interchangeable jitted implementations chosen
by a static field:

    "xla"    — dequantize -> matmul, fused by XLA  (≙ PYTORCH/COMPILE backends)
    "pallas" — fused in-register dequant+matmul Pallas kernel (≙ ATEN/fused)
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct
from jax import Array

from ..core.quantize import QTensor, dequantize, quantize

__all__ = ["Linear", "QuantLinear", "quant_matmul", "dequant_matmul"]


@struct.dataclass
class Linear:
    """Dense linear layer as an immutable pytree (torch convention:
    weight [out_features, in_features]); the unquantized peer of
    `QuantLinear` so model code is polymorphic over both."""

    weight: Array
    bias: Optional[Array] = None

    @property
    def in_features(self) -> int:
        return self.weight.shape[1]

    @property
    def out_features(self) -> int:
        return self.weight.shape[0]

    def __call__(self, x: Array) -> Array:
        out = jax.lax.dot_general(
            x,
            self.weight.astype(x.dtype),
            dimension_numbers=(((x.ndim - 1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
        if self.bias is not None:
            out = out + self.bias.astype(out.dtype)
        return out


def _matmul_dq(x: Array, qt: QTensor) -> Array:
    """x @ dequantize(qt)^T in the layer compute dtype."""
    w = dequantize(qt, qt.compute_dtype)  # [out, in]
    return jax.lax.dot_general(
        x.astype(qt.compute_dtype),
        w,
        dimension_numbers=(((x.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(qt.compute_dtype)


@jax.custom_vjp
def dequant_matmul(x: Array, qt: QTensor) -> Array:
    """`x @ W_dq^T` with a memory-efficient backward: the dequantized weight
    is never stored as a residual — it is recomputed from the packed codes in
    the backward pass, and no weight/scale/zero gradients are produced
    (≙ reference autograd Functions, `core/quantize.py:289-352`)."""
    return _matmul_dq(x, qt)


def _dequant_matmul_fwd(x, qt):
    return _matmul_dq(x, qt), qt


def _zero_cotangent(x):
    # Integer leaves (packed codes) take float0 cotangents; float leaves
    # (scale/zero) get symbolic zeros — no gradient ever flows to the weight.
    if jnp.issubdtype(x.dtype, jnp.floating):
        return jnp.zeros_like(x)
    import numpy as _np

    return _np.zeros(x.shape, dtype=jax.dtypes.float0)


def _dequant_matmul_bwd(qt, g):
    w = dequantize(qt, qt.compute_dtype)  # recompute, don't store
    dx = jax.lax.dot_general(
        g.astype(qt.compute_dtype),
        w,
        dimension_numbers=(((g.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(qt.compute_dtype)
    d_qt = jax.tree_util.tree_map(_zero_cotangent, qt)
    return dx, d_qt


dequant_matmul.defvjp(_dequant_matmul_fwd, _dequant_matmul_bwd)


def quant_matmul(x: Array, qt: QTensor, backend: str = "xla") -> Array:
    """Dispatch `x @ W_dq^T` to a backend implementation.

    The "pallas" backend requires an inference-prepared layer (see
    `hqq_tpu.backends.pallas_backend.PallasQuantLinear`); passing a canonical
    QTensor here uses the XLA path.
    """
    return dequant_matmul(x, qt)


@struct.dataclass
class QuantLinear:
    """Immutable quantized linear layer (pytree).

    ≙ `HQQLinear` (`/root/reference/hqq/core/quantize.py:387`): holds the
    packed `QTensor` plus an optional bias; `__call__` is pure. Construct with
    `QuantLinear.from_weights` / `QuantLinear.quantize`.
    """

    qweight: QTensor
    bias: Optional[Array] = None
    backend: str = struct.field(pytree_node=False, default="xla")

    # -- constructors -------------------------------------------------------
    @classmethod
    def quantize(
        cls,
        weight: Array,
        bias: Optional[Array] = None,
        quant_config: Optional[dict] = None,
        compute_dtype=None,
        backend: str = "xla",
        **quant_kwargs,
    ) -> "QuantLinear":
        """Quantize a dense [out_features, in_features] weight.

        `quant_config` is a `BaseQuantizeConfig(...)` dict; extra kwargs
        override individual weight_quant_params, and an explicit
        `compute_dtype` overrides the config's. group_size=None resolves to
        a full row/column (per-channel), ≙ ref `core/quantize.py:441-447`.
        """
        params: dict = {}
        if quant_config is not None:
            params.update(quant_config["weight_quant_params"])
            if quant_config.get("scale_quant_params") is not None:
                params["scale_quant_params"] = quant_config["scale_quant_params"]
            if quant_config.get("zero_quant_params") is not None:
                params["zero_quant_params"] = quant_config["zero_quant_params"]
        params.update(quant_kwargs)
        if compute_dtype is not None:
            params["compute_dtype"] = compute_dtype
        params.setdefault("compute_dtype", jnp.bfloat16)
        if params.get("group_size", 64) is None:
            params["group_size"] = (
                weight.shape[1] if params.get("axis", 1) == 1 else weight.shape[0]
            )
        qt = quantize(weight, **params)
        if bias is not None:
            bias = jnp.asarray(bias, qt.compute_dtype)
        return cls(qweight=qt, bias=bias, backend=backend)

    from_weights = quantize  # alias, ≙ HQQLinear.from_weights (ref :465-487)

    # -- properties ---------------------------------------------------------
    @property
    def in_features(self) -> int:
        return self.qweight.shape[1]

    @property
    def out_features(self) -> int:
        return self.qweight.shape[0]

    @property
    def compute_dtype(self):
        return self.qweight.compute_dtype

    # -- forward ------------------------------------------------------------
    def __call__(self, x: Array) -> Array:
        out = quant_matmul(x, self.qweight, backend=self.backend)
        if self.bias is not None:
            out = out + self.bias
        return out

    def dequantize(self, dtype=None) -> Array:
        return dequantize(self.qweight, dtype=dtype)

    def with_backend(self, backend: str) -> "QuantLinear":
        return dataclasses.replace(self, backend=backend)
