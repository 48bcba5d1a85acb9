# SPDX-License-Identifier: Apache-2.0
"""Pallas fused-kernel inference backend.

≙ the reference's fused backends (`/root/reference/hqq/backends/torchao.py`,
`bitblas.py`, `marlin.py`, `gemlite.py`): converts an already-quantized
`QuantLinear` into a module whose forward is a single fused dequant+matmul
kernel, via a one-time repack into the kernel storage layout. Conversion is
driven by `hqq_tpu.utils.patching.prepare_for_inference`."""

from __future__ import annotations

from typing import Optional

from flax import struct
from jax import Array

from ..nn.linear import QuantLinear
from ..ops.fused_matmul import (
    KernelQTensor,
    dequant_pallas,
    quant_matmul_pallas,
    supports_kernel_layout,
    to_kernel_layout,
)

__all__ = ["PallasQuantLinear", "patch_quantlinear_to_pallas"]


@struct.dataclass
class PallasQuantLinear:
    """Inference-only quantized linear running the fused Pallas kernel."""

    kqt: KernelQTensor
    bias: Optional[Array] = None

    @property
    def in_features(self) -> int:
        return self.kqt.k

    @property
    def out_features(self) -> int:
        return self.kqt.n

    @property
    def compute_dtype(self):
        return self.kqt.compute_dtype

    def __call__(self, x: Array) -> Array:
        out = quant_matmul_pallas(x.astype(self.compute_dtype), self.kqt)
        if self.bias is not None:
            out = out + self.bias
        return out

    def dequantize(self, dtype=None) -> Array:
        """Returns W [out, in] (transpose of the kernel-layout W^T)."""
        w_t = dequant_pallas(self.kqt)
        return w_t.T.astype(dtype if dtype is not None else self.compute_dtype)


def patch_quantlinear_to_pallas(layer: QuantLinear) -> PallasQuantLinear | QuantLinear:
    """Convert a `QuantLinear` to the fused Pallas backend; returns the layer
    unchanged when its config is not fusable (axis=0, exotic group sizes) —
    same graceful-fallback contract as the reference's backend patching
    (`/root/reference/hqq/utils/patching.py:129-177`)."""
    if not supports_kernel_layout(layer.qweight):
        return layer
    return PallasQuantLinear(kqt=to_kernel_layout(layer.qweight), bias=layer.bias)
