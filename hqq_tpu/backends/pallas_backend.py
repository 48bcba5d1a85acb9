# SPDX-License-Identifier: Apache-2.0
"""Pallas fused-kernel inference backend.

≙ the reference's fused backends (`/root/reference/hqq/backends/torchao.py`,
`bitblas.py`, `marlin.py`, `gemlite.py`): converts an already-quantized
`QuantLinear` into a module whose forward is a single fused dequant+matmul
kernel, via a one-time repack into the kernel storage layout. Conversion is
driven by `hqq_tpu.utils.patching.prepare_for_inference`."""

from __future__ import annotations

from typing import Any, Optional

from flax import struct
from jax import Array

from ..nn.linear import QuantLinear
from ..ops.fused_matmul import (
    KernelQTensor,
    dequant_pallas,
    quant_matmul_pallas,
    quant_matmul_pallas_a8,
    supports_kernel_layout,
    supports_kernel_layout_ax0,
    to_kernel_layout,
    to_kernel_layout_ax0,
)

__all__ = [
    "PallasQuantLinear",
    "A8QuantLinear",
    "PallasLoRAQuantLinear",
    "patch_quantlinear_to_pallas",
    "patch_quantlinear_to_w4a8",
    "patch_lora_to_pallas",
]


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



def _ax0_meta_dtype(qt, meta_dtype=None):
    """Meta (scale/zs) storage dtype policy for axis=0 kernel layouts.

    None = auto: bf16 for the sub-8-step CHUNK-MAJOR quality configs
    (2b g16, 1b g16/g32), fp32 otherwise. Rationale (measured on v5e,
    tools/kernel_lab_ax0_meta.py, same-run vs the ax1-4b floor): at g=16
    fp32 scale+zs is ~2/3 of the config's HBM traffic — bf16 took 2b g16
    from 1.32x to 1.13x the floor and 1b g32 from 1.09x to 0.97x. For the
    >=8-step configs (3b/2b g64) bf16 measured ~25% SLOWER (Mosaic's bf16
    broadcast-multiply underperforms fp32, same as the ax1 note in
    `to_kernel_layout`), so they stay fp32. The bf16 rounding adds ~5e-3
    relative weight error — noise against 1-2-bit quantization error
    (bounded in tests/test_ax0_kernel.py::test_ax0_bf16_meta_policy)."""
    if meta_dtype is not None:
        return meta_dtype
    import jax.numpy as jnp

    from ..ops.fused_matmul import _KERNEL_CONTAINER_BITS

    g = qt.group_size
    r = 8 // _KERNEL_CONTAINER_BITS[qt.nbits]
    return jnp.bfloat16 if (r > 1 and g // r < 8) else jnp.float32


def patch_quantlinear_to_pallas(
    layer: QuantLinear, meta_dtype=None
) -> PallasQuantLinear | QuantLinear:
    """Convert a `QuantLinear` to the fused Pallas backend; returns the layer
    unchanged when its config is not fusable (exotic group sizes) — same
    graceful-fallback contract as the reference's backend patching
    (`/root/reference/hqq/utils/patching.py:129-177`). Axis=0 layers convert
    to the permuted-layout axis=0 kernel (the reference's native layer is
    axis=0-ONLY, `hqq_aten_cuda.cpp:42` — here both axes fuse)."""
    import jax.numpy as jnp

    md = meta_dtype if meta_dtype is not None else jnp.float32
    if supports_kernel_layout(layer.qweight):
        return PallasQuantLinear(
            kqt=to_kernel_layout(layer.qweight, meta_dtype=md), bias=layer.bias
        )
    if supports_kernel_layout_ax0(layer.qweight):
        return PallasQuantLinear(
            kqt=to_kernel_layout_ax0(
                layer.qweight, meta_dtype=_ax0_meta_dtype(layer.qweight, meta_dtype)
            ),
            bias=layer.bias,
        )
    return layer


@struct.dataclass
class A8QuantLinear:
    """W4A8 serving layer: true 4-bit HBM storage feeding int8 MXU operands
    (`ops.fused_matmul.quant_matmul_pallas_a8`). Weight-side arithmetic is
    bit-identical to HQQ dequant; activations are dynamically int8-quantized
    per token (the int8 backend's approximation) — so this backend combines
    the pallas backend's memory footprint with (near) int8-backend speed at
    decode batch sizes. ≙ the reference's marlin/gemlite "fast quantized
    kernel" backends (`/root/reference/hqq/backends/marlin.py`)."""

    kqt: KernelQTensor
    bias: Optional[Array] = None
    # Mesh axis to pmax the activation scale over (set by TP prep on
    # K-sharded rows) — makes the TP psum reproduce the single-device
    # activation quantization exactly. None outside shard_map.
    reduce_axis: Optional[str] = struct.field(pytree_node=False, default=None)

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
        out = quant_matmul_pallas_a8(
            x.astype(self.compute_dtype), self.kqt, reduce_axis=self.reduce_axis
        )
        if self.bias is not None:
            out = out + self.bias
        return out

    def dequantize(self, dtype=None) -> Array:
        w_t = dequant_pallas(self.kqt)
        return w_t.T.astype(dtype if dtype is not None else self.compute_dtype)


def patch_quantlinear_to_w4a8(
    layer: QuantLinear, meta_dtype=None
) -> "A8QuantLinear | QuantLinear":
    """Convert a `QuantLinear` to the W4A8 backend; returns the layer
    unchanged when not fusable (axis=0, exotic group sizes).

    K storage is padded to 32 groups when the byte overhead stays ≤ 1/8 —
    that enables the fastest M=1 class-replicated kernel (e.g. Llama-7B
    11008 → 12288, +11.6% on that matmul only, net win) — and to the minimum
    8 groups otherwise (e.g. 13B's 5120 would pad +20%; M=1 then routes
    through the S=8 kernel instead)."""
    if not supports_kernel_layout(layer.qweight):
        return layer
    import jax.numpy as jnp

    md = meta_dtype if meta_dtype is not None else jnp.float32
    return A8QuantLinear(
        kqt=to_kernel_layout(
            layer.qweight, meta_dtype=md,
            pad_k_groups=_a8_pad_k_groups(layer.qweight),
        ),
        bias=layer.bias,
    )


def _a8_pad_k_groups(qt) -> int:
    """K-padding group multiple for the a8 kernels: the deepest
    class-replication tier (32 > 16 > 8) whose zero-padding stays ≤5% of K.
    Padding is streamed AND dotted, so it costs time, not just bytes —
    k=11008 padded to 32 groups (11.6% waste) measured ~8% slower than the
    16-group tier with 2.3% waste (tools/kernel_lab_a8v2.py pass3)."""
    g = qt.group_size
    k = qt.shape[1]
    for tier in (32, 16):
        pad = -(-k // (tier * g)) * tier * g
        if (pad - k) * 20 <= k:
            return tier
    return 8


def _patch_w4a8_any_axis(layer: QuantLinear, meta_dtype=None):
    """w4a8 conversion covering both axes: axis=1 gets the int8-operand
    kernels; axis=0 gets the fused bf16-operand axis=0 kernel (its scales
    vary along K per output row, so int8-dot factorization doesn't apply —
    the A8 module's matmul dispatches accordingly)."""
    if supports_kernel_layout(layer.qweight):
        return patch_quantlinear_to_w4a8(layer, meta_dtype)
    if supports_kernel_layout_ax0(layer.qweight):
        return A8QuantLinear(
            kqt=to_kernel_layout_ax0(
                layer.qweight, meta_dtype=_ax0_meta_dtype(layer.qweight, meta_dtype)
            ),
            bias=layer.bias,
        )
    return layer


@struct.dataclass
class PallasLoRAQuantLinear:
    """HQQ+ serving layer: fused dequant-matmul + LoRA epilogue in ONE Pallas
    kernel (`ops.fused_matmul.quant_matmul_pallas_lora`). The adapter scaling
    is folded into `b` at conversion time."""

    kqt: Any
    a: Any  # [K, r]
    b: Any  # [r, N] (scaling folded)
    bias: Optional[Any] = None

    @property
    def in_features(self) -> int:
        return self.kqt.k

    @property
    def out_features(self) -> int:
        return self.kqt.n

    def __call__(self, x):
        from ..ops.fused_matmul import quant_matmul_pallas_lora

        out = quant_matmul_pallas_lora(x, self.kqt, self.a, self.b)
        if self.bias is not None:
            out = out + self.bias.astype(out.dtype)
        return out


def patch_lora_to_pallas(lora) -> "PallasLoRAQuantLinear | Any":
    """LoRALinear(QuantLinear base) -> fused kernel module; returns the input
    unchanged when the base isn't kernel-eligible."""
    from ..nn.linear import QuantLinear
    from ..ops.fused_matmul import supports_kernel_layout, to_kernel_layout

    base = lora.base
    if not (isinstance(base, QuantLinear) and supports_kernel_layout(base.qweight)):
        return lora
    bias = base.bias
    if lora.bias is not None:
        bias = lora.bias if bias is None else bias + lora.bias
    return PallasLoRAQuantLinear(
        kqt=to_kernel_layout(base.qweight),
        a=lora.lora_a,
        b=lora.lora_b * lora.scaling,
        bias=bias,
    )


@struct.dataclass
class A8LoRAQuantLinear:
    """HQQ+ on the w4a8 serving path: int8-operand decode kernel with the
    LoRA epilogue fused in (`ops.fused_matmul.quant_matmul_pallas_a8_lora`) —
    BASELINE config 4 without forfeiting the int8-MXU-rate decode path.
    The adapter dot runs at full activation precision."""

    kqt: Any
    a: Any  # [K, r]
    b: Any  # [r, N] (scaling folded)
    bias: Optional[Any] = None

    @property
    def in_features(self) -> int:
        return self.kqt.k

    @property
    def out_features(self) -> int:
        return self.kqt.n

    def __call__(self, x):
        from ..ops.fused_matmul import quant_matmul_pallas_a8_lora

        out = quant_matmul_pallas_a8_lora(x, self.kqt, self.a, self.b)
        if self.bias is not None:
            out = out + self.bias.astype(out.dtype)
        return out


def patch_lora_to_w4a8(lora) -> "A8LoRAQuantLinear | Any":
    """LoRALinear(QuantLinear base) -> fused w4a8+LoRA module; returns the
    input unchanged when the base isn't kernel-eligible."""
    from ..nn.linear import QuantLinear
    from ..ops.fused_matmul import supports_kernel_layout, to_kernel_layout

    base = lora.base
    if not (isinstance(base, QuantLinear) and supports_kernel_layout(base.qweight)):
        return lora
    bias = base.bias
    if lora.bias is not None:
        bias = lora.bias if bias is None else bias + lora.bias
    return A8LoRAQuantLinear(
        kqt=to_kernel_layout(base.qweight, pad_k_groups=_a8_pad_k_groups(base.qweight)),
        a=lora.lora_a,
        b=lora.lora_b * lora.scaling,
        bias=bias,
    )
