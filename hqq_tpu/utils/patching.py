# SPDX-License-Identifier: Apache-2.0
"""Inference preparation: convert quantized layers to fused backends.

≙ `/root/reference/hqq/utils/patching.py:129-177` (`prepare_for_inference`):
walks the model tree and swaps every `QuantLinear` for its fused-backend
equivalent where the config allows, falling back gracefully otherwise. The
reference's backend zoo (torchao_int4 / bitblas / marlin / gemlite) collapses
on TPU to:

    "xla"    — keep QuantLinear (XLA-fused dequant+matmul)
    "pallas" — PallasQuantLinear (fused in-register dequant+matmul kernel,
               bf16 MXU operands — minimum-HBM, exact weights)
    "w4a8"   — A8QuantLinear (fused kernel keeping 4-bit HBM storage but
               feeding the MXU int8 operands — pallas footprint at near-int8
               decode speed; adds the int8 backend's dynamic activation
               quantization but NO weight requant error)
    "int8"   — Int8QuantLinear (dynamic A8W8, int8 MXU matmul, ≙ the
               reference's experimental int8 path done as a prepared module;
               stores 8-bit weights — 2× the HBM bytes of w4a8)

Axis=0 quantized layers fuse through the permuted-layout axis=0 kernel
(`ops.fused_matmul.KernelQTensor0`) under both "pallas" and "w4a8" — the
reference's native layer serves ONLY axis=0 (`hqq_aten_cuda.cpp:42`); here
both axes have fused kernels. "int8" (one-time requant) also accepts any
layout.

LoRA-wrapped layers convert their base in place (≙ ref `:26-50`).
Also provides `patch_merge_zeros_with_lora` math helpers' analogue:
`merge_zeros_into_lora` folds asymmetric zero-points into a rank+1 adapter so
a symmetric kernel can be used (≙ ref `utils/patching.py:193-257`).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax.numpy as jnp

from ..backends.int8_backend import patch_quantlinear_to_int8
from ..backends.pallas_backend import PallasQuantLinear, patch_quantlinear_to_pallas
from ..core.peft import LoRALinear
from ..nn.linear import QuantLinear

__all__ = ["prepare_for_inference", "merge_zeros_into_lora", "lowrank_approx", "fuse_for_decode"]

BACKENDS = ("xla", "pallas", "w4a8", "int8")


def prepare_for_inference(params: Any, backend="pallas", verbose: bool = False,
                          meta_dtype=None) -> Any:
    """Swap quantized layers to the requested inference backend.

    `backend` is a single name or a {linear_tag: backend} dict for per-tag
    mixing (e.g. int8 attention + pallas FFN so a 13B fits a 16 GB chip at
    the int8 speed where it matters; tags as in `models.base.get_linear_tags`,
    missing tags keep "xla").

    `meta_dtype` overrides the kernel-layout scale/zs storage dtype. None =
    per-config policy (`backends.pallas_backend._ax0_meta_dtype`: bf16 for
    the sub-8-step axis=0 quality configs, fp32 everywhere else). Pass
    `jnp.float32` to force bit-exact parity with the xla dequant path."""
    from ..models.base import name_to_linear_tag

    per_tag = isinstance(backend, dict)
    if per_tag:
        for b in backend.values():
            assert b in BACKENDS, f"backend must be one of {BACKENDS}: {b}"
    else:
        assert backend in BACKENDS, f"backend must be one of {BACKENDS}"
    stats = {"converted": 0, "kept": 0}

    def one(node: Any, b: str) -> Any:
        if b == "pallas":
            out = patch_quantlinear_to_pallas(node, meta_dtype)
            stats["converted" if out is not node else "kept"] += 1
            return out
        if b == "w4a8":
            from ..backends.pallas_backend import _patch_w4a8_any_axis

            out = _patch_w4a8_any_axis(node, meta_dtype)
            stats["converted" if out is not node else "kept"] += 1
            return out
        if b == "int8":
            stats["converted"] += 1
            return patch_quantlinear_to_int8(node)
        stats["kept"] += 1
        return node

    def convert(node: Any, path: str = "") -> Any:
        if isinstance(node, dict):
            return {k: convert(v, f"{path}.{k}" if path else k) for k, v in node.items()}
        if isinstance(node, list):
            return [convert(v, f"{path}.{i}" if path else str(i)) for i, v in enumerate(node)]
        if isinstance(node, LoRALinear):
            b = backend.get(name_to_linear_tag(path)) if per_tag else backend
            if b in ("pallas", "w4a8"):
                from ..backends.pallas_backend import (
                    patch_lora_to_pallas,
                    patch_lora_to_w4a8,
                )

                fused = (patch_lora_to_pallas if b == "pallas"
                         else patch_lora_to_w4a8)(node)
                if fused is not node:
                    stats["converted"] += 1
                    return fused
            return dataclasses.replace(node, base=convert(node.base, path))
        if isinstance(node, QuantLinear):
            b = backend.get(name_to_linear_tag(path), "xla") if per_tag else backend
            return one(node, b)
        if isinstance(node, PallasQuantLinear) and backend == "xla":
            raise ValueError("cannot convert PallasQuantLinear back to xla backend")
        return node

    out = convert(params)
    if verbose:
        print(f"prepare_for_inference[{backend}]: {stats}")
    return out


def auto_mix_plan(params: Any, hbm_budget_bytes: Optional[int] = None,
                  reserve_bytes: int = 0) -> Dict[str, str]:
    """Auto-build the per-tag backend plan `prepare_for_inference` accepts
    (VERDICT r4 item 7): int8 is the prefill-rate backend (dense int8 MXU
    dots measured 1.3-2x the fused w4a8 prefill route,
    tools/kernel_lab_prefill.py) at ~1 byte/param; w4a8 is the half-memory
    backend (~0.56 byte/param incl. fp32 meta) with the best M=1 decode.
    The plan starts all-int8 (fastest prefill) and demotes the LARGEST tags
    to w4a8 until the weight footprint fits `hbm_budget_bytes` minus
    `reserve_bytes` (KV pool, activations). No budget -> all int8.

    This generalizes the measured 13B recipe (int8 attention + w4a8 FFN fits
    one 16 GB chip at int8 speed where it matters — docs/SERVING.md) to any
    model tree, replacing hand-picked per-tag dicts."""
    from ..models.base import name_to_linear_tag
    from ..nn.linear import QuantLinear

    # per-tag parameter counts over quantized leaves
    sizes: Dict[str, int] = {}

    def visit(node, path=""):
        if isinstance(node, dict):
            for k, v in node.items():
                visit(v, f"{path}.{k}" if path else k)
        elif isinstance(node, list):
            for i, v in enumerate(node):
                visit(v, f"{path}.{i}" if path else str(i))
        elif isinstance(node, QuantLinear):
            tag = name_to_linear_tag(path)
            n, k = node.qweight.shape
            g = node.qweight.group_size or 64
            p_int8, p_w4a8 = sizes.get(tag, (0, 0))
            sizes[tag] = (p_int8 + n * k,
                          p_w4a8 + n * k // 2 + (n * k // max(g, 1)) * 8)

    visit(params)
    plan = {tag: "int8" for tag in sizes}
    if hbm_budget_bytes is None:
        return plan

    def footprint():
        return sum(sizes[t][0] if plan[t] == "int8" else sizes[t][1]
                   for t in sizes)

    budget = hbm_budget_bytes - reserve_bytes
    for tag in sorted(sizes, key=lambda t: sizes[t][0], reverse=True):
        if footprint() <= budget:
            break
        plan[tag] = "w4a8"
    return plan


def _concat_linears(layers, pad_to: int = 512):
    """Concatenate linear-like layers along the output dimension.

    Supports Int8QuantLinear (w8/sw rows concat) and plain Linear; returns
    None if the group is heterogeneous or unsupported. `pad_to`: the A8
    (w4a8) fused width is re-padded to this lane multiple when <= 1/16 extra
    bytes (0 disables) — same knob `fuse_for_decode` applies to int8 layers
    via `pad_for_mxu`."""
    from ..backends.int8_backend import Int8QuantLinear
    from ..backends.pallas_backend import A8QuantLinear
    from ..nn.linear import Linear

    if all(isinstance(l, A8QuantLinear) for l in layers):
        from ..ops.fused_matmul import KernelQTensor

        kqts = [l.kqt for l in layers]
        k0 = kqts[0]
        same = all(
            # axis=1 layout ONLY: the axis=0 KernelQTensor0 stores W row-major
            # [N, K] — concatenating its arrays along axis=1 would join K, not
            # N, and corrupt the fused layer (axis=0 layers stay unfused)
            isinstance(kq, KernelQTensor)
            and kq.wq.shape[0] == k0.wq.shape[0]
            and kq.group_size == k0.group_size
            and kq.container_bits == k0.container_bits
            and kq.n == kq.wq.shape[1]  # no N padding (concat must stay contiguous)
            for kq in kqts
        )
        if not same:
            return None
        n_fused = sum(kq.n for kq in kqts)
        # Re-pad the fused N to a 512-lane multiple when cheap (≤ 1/16 extra
        # bytes): guarantees the decode kernel an N-tile ≥ 512. Without it an
        # awkward width (llama gate_up: 22016 = 128·172) degrades
        # `_pick_tile_n` to small tiles and the grid goes
        # overhead-dominated — measured 16% slower at the unfused 11008
        # shape (tools/kernel_lab_padn.py). Padded columns carry
        # codes=0 / scale=1 / zs=0 (dequantize to exactly 0) and the kernel
        # slices outputs to the logical `shape[1]`.
        n_al = -(-n_fused // pad_to) * pad_to if pad_to else n_fused
        pad_n = n_al - n_fused if (n_al - n_fused) * 16 <= n_fused else 0
        fused_kqt = k0.replace(
            wq=jnp.pad(
                jnp.concatenate([kq.wq for kq in kqts], axis=1),
                ((0, 0), (0, pad_n)),
            ),
            scale=jnp.pad(
                jnp.concatenate([kq.scale for kq in kqts], axis=1),
                ((0, 0), (0, pad_n)), constant_values=1.0,
            ),
            zs=jnp.pad(
                jnp.concatenate([kq.zs for kq in kqts], axis=1),
                ((0, 0), (0, pad_n)),
            ),
            shape=(k0.k, n_fused),
        )
        biases = [l.bias for l in layers]
        bias = None
        if any(b is not None for b in biases):
            bias = jnp.concatenate(
                [b if b is not None else jnp.zeros((l.out_features,), l.compute_dtype)
                 for l, b in zip(layers, biases)]
            )
        return A8QuantLinear(kqt=fused_kqt, bias=bias)
    if all(isinstance(l, Int8QuantLinear) for l in layers):
        biases = [l.bias for l in layers]
        has_bias = any(b is not None for b in biases)
        if has_bias:
            bias = jnp.concatenate(
                [b if b is not None else jnp.zeros((l.out_features,), l.compute_dtype)
                 for l, b in zip(layers, biases)]
            )
        else:
            bias = None
        return Int8QuantLinear(
            w8=jnp.concatenate([l.w8 for l in layers], axis=0),
            sw=jnp.concatenate([l.sw for l in layers], axis=0),
            bias=bias,
            compute_dtype=layers[0].compute_dtype,
        )
    if all(isinstance(l, Linear) for l in layers):
        biases = [l.bias for l in layers]
        has_bias = any(b is not None for b in biases)
        bias = (
            jnp.concatenate(
                [b if b is not None else jnp.zeros((l.out_features,), l.weight.dtype)
                 for l, b in zip(layers, biases)]
            )
            if has_bias
            else None
        )
        return Linear(
            weight=jnp.concatenate([l.weight for l in layers], axis=0), bias=bias
        )
    return None


def fuse_for_decode(params: Any, pad_to: int = 512) -> Any:
    """Fuse per-layer q/k/v into one `qkv_proj` and gate/up into one
    `gate_up_proj` (Llama-family trees incl. gemma2/3 and granite; olmo2 is
    excluded — it norms the flat projection output). One wide matmul feeds the MXU far
    better than three narrow ones at decode batch sizes (measured: int8 dot
    at N=12288 runs ~1.75x the bytes/s of N=4096). Run AFTER
    `prepare_for_inference(backend="int8")`. ≙ the reference's merged-QKV
    Phi variant (`models/hf/phi_opt.py:8-57`) as a general transformation."""

    def fuse_layer(layer: dict) -> dict:
        out = dict(layer)
        sa = layer.get("self_attn")
        if isinstance(sa, dict) and "q_norm_flat" in sa:
            return out  # olmo2-style flat-projection norms: can't fuse qkv
        if isinstance(sa, dict) and all(k in sa for k in ("q_proj", "k_proj", "v_proj")):
            fused = _concat_linears(
                [sa["q_proj"], sa["k_proj"], sa["v_proj"]], pad_to=pad_to
            )
            if fused is not None:
                sa = {k: v for k, v in sa.items() if k not in ("q_proj", "k_proj", "v_proj")}
                sa["qkv_proj"] = fused
            out["self_attn"] = sa
        mlp = layer.get("mlp")
        if isinstance(mlp, dict) and all(k in mlp for k in ("gate_proj", "up_proj")):
            fused = _concat_linears(
                [mlp["gate_proj"], mlp["up_proj"]], pad_to=pad_to
            )
            if fused is not None:
                mlp = {k: v for k, v in mlp.items() if k not in ("gate_proj", "up_proj")}
                mlp["gate_up_proj"] = fused
            out["mlp"] = mlp
        return out

    out = dict(params)
    if "layers" in out:
        out["layers"] = [fuse_layer(l) for l in out["layers"]]

    if pad_to:
        from ..backends.int8_backend import Int8QuantLinear, pad_for_mxu

        def pad(node):
            if isinstance(node, dict):
                return {k: pad(v) for k, v in node.items()}
            if isinstance(node, list):
                return [pad(v) for v in node]
            if isinstance(node, Int8QuantLinear):
                return pad_for_mxu(node, pad_to)
            return node

        out = pad(out)
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
