# SPDX-License-Identifier: Apache-2.0
from .linear import Linear, QuantLinear, dequant_matmul, quant_matmul  # noqa: F401
