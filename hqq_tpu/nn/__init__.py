# SPDX-License-Identifier: Apache-2.0
from .linear import Linear, QuantLinear, dequant_matmul, quant_matmul  # noqa: F401
from .moe import GroupedLinear, GroupedQuantLinear, quantize_grouped  # noqa: F401
from .multilora import MultiLoRALinear, adapter_context, stack_adapters  # noqa: F401
