# SPDX-License-Identifier: Apache-2.0
"""Inference preparation: convert quantized layers to fused backends.

≙ `/root/reference/hqq/utils/patching.py:129-177` (`prepare_for_inference`):
walks the model tree and swaps every `QuantLinear` for its fused-backend
equivalent where the config allows, falling back gracefully otherwise. The
reference's backend zoo (torchao_int4 / bitblas / marlin / gemlite) collapses
on TPU to:

    "xla"    — keep QuantLinear (XLA-fused dequant+matmul)
    "pallas" — PallasQuantLinear (fused in-register dequant+matmul kernel)
    "int8"   — Int8QuantLinear (dynamic A8W8, int8 MXU matmul, ≙ the
               reference's experimental int8 path done as a prepared module)

LoRA-wrapped layers convert their base in place (≙ ref `:26-50`).
Also provides `patch_merge_zeros_with_lora` math helpers' analogue:
`merge_zeros_into_lora` folds asymmetric zero-points into a rank+1 adapter so
a symmetric kernel can be used (≙ ref `utils/patching.py:193-257`).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax.numpy as jnp

from ..backends.int8_backend import patch_quantlinear_to_int8
from ..backends.pallas_backend import PallasQuantLinear, patch_quantlinear_to_pallas
from ..core.peft import LoRALinear
from ..nn.linear import QuantLinear

__all__ = ["prepare_for_inference", "merge_zeros_into_lora", "lowrank_approx"]

BACKENDS = ("xla", "pallas", "int8")


def prepare_for_inference(params: Any, backend: str = "pallas", verbose: bool = False) -> Any:
    """Swap quantized layers to the requested inference backend."""
    assert backend in BACKENDS, f"backend must be one of {BACKENDS}"
    stats = {"converted": 0, "kept": 0}

    def convert(node: Any) -> Any:
        if isinstance(node, dict):
            return {k: convert(v) for k, v in node.items()}
        if isinstance(node, list):
            return [convert(v) for v in node]
        if isinstance(node, LoRALinear):
            return dataclasses.replace(node, base=convert(node.base))
        if isinstance(node, QuantLinear) and backend == "pallas":
            out = patch_quantlinear_to_pallas(node)
            stats["converted" if out is not node else "kept"] += 1
            return out
        if isinstance(node, QuantLinear) and backend == "int8":
            stats["converted"] += 1
            return patch_quantlinear_to_int8(node)
        if isinstance(node, PallasQuantLinear) and backend == "xla":
            raise ValueError("cannot convert PallasQuantLinear back to xla backend")
        return node

    out = convert(params)
    if verbose:
        print(f"prepare_for_inference[{backend}]: {stats}")
    return out


def lowrank_approx(w, max_rank: int):
    """Best rank-r approximation factors of a 2-D matrix via truncated SVD:
    returns (A [in, r], B [r, out]) with W^T ~= A @ B
    (≙ `low_rank_decomposition`, ref `utils/patching.py:180-189`)."""
    u, s, vt = jnp.linalg.svd(jnp.asarray(w, jnp.float32).T, full_matrices=False)
    r = min(int(max_rank), s.shape[0])
    a = u[:, :r] * s[:r][None, :]
    b = vt[:r, :]
    return a, b


def merge_zeros_into_lora(layer: QuantLinear, rank_pad: int = 1):
    """Fold the asymmetric zero-point into an extended low-rank term so the
    remaining kernel is symmetric: W_dq = codes*scale - zero*scale, and the
    rank-1 correction  u @ v  with u = ones[out,1] column accumulation
    (≙ `patch_merge_zeros_with_lora`, ref `utils/patching.py:193-257`).

    Returns (symmetric_qtensor_parts, (a_extra [in, 1], b_extra [1, out])).
    For axis=1 grouping the zero term contributes
        y_zero[n] = - sum_g zs[n, g] * sum_{k in g} x[k]
    which is exactly a rank-(K/g) term; the common practical case
    group_size == in_features (per-channel) reduces to rank 1 — that is the
    case the reference supports, and what we expose here.
    """
    qt = layer.qweight
    assert qt.axis == 1 and qt.group_size == qt.shape[1], (
        "zero-folding requires per-channel (group_size == in_features) axis=1"
    )
    zs = (qt.zero * qt.scale).reshape(qt.shape[0])  # [out]
    a_extra = jnp.ones((qt.shape[1], 1), jnp.float32)
    b_extra = -zs[None, :].astype(jnp.float32)  # [1, out]
    return a_extra, b_extra
