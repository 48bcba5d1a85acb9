# SPDX-License-Identifier: Apache-2.0
from .pallas_backend import (  # noqa: F401
    PallasQuantLinear,
    patch_quantlinear_to_pallas,
)
