# SPDX-License-Identifier: Apache-2.0
from .quantize import (  # noqa: F401
    BaseQuantizeConfig,
    QTensor,
    Quantizer,
    dequantize,
    quantize,
    unpack_codes,
    SUPPORTED_BITS,
)
from .optimize import (  # noqa: F401
    optimize_weights_proximal,
    optimize_weights_proximal_v2,
    shrink_lp,
    update_scale_grid_search,
)
from . import bitpack  # noqa: F401
