# SPDX-License-Identifier: Apache-2.0
"""hqq_tpu — TPU-native Half-Quadratic Quantization framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
`mobiusml/hqq`: calibration-free post-training weight quantization
(8/6/5/4/3/2/1.58/1-bit, per-group scale/zero), an on-device half-quadratic
proximal solver, bit-packed storage with fused Pallas dequant+matmul kernels,
LoRA-on-quantized training (HQQ+), model-level quantize/save/load for
HuggingFace checkpoints, and a sharded (pjit/GSPMD) generation runtime.
"""

__version__ = "0.1.0"

from .core import (  # noqa: F401
    BaseQuantizeConfig,
    QTensor,
    Quantizer,
    dequantize,
    quantize,
)
