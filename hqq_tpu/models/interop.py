# SPDX-License-Identifier: Apache-2.0
"""Interop with reference-HQQ checkpoints.

Imports models quantized by the original torch HQQ library
(`AutoHQQHFModel.save_quantized` format: `config.json` + `qmodel.pt`, a
torch.save of {module_name: encoded state dict},
`/root/reference/hqq/models/base.py:403-434`) into hqq_tpu param pytrees —
possible because our bit-packed containers are bit-identical to the
reference's (`hqq_tpu/core/bitpack.py`). Quantize on GPU with the reference,
serve on TPU with this framework (or vice versa via `export`).

The encoded-state scalar conventions follow the reference
(`/root/reference/hqq/core/utils.py:36-68`): ints as int32 0-d tensors,
bools as uint8, strings as uint8 ord arrays, shapes as 1-d int tensors.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..core.quantize import BIT_TO_PACKING, QTensor
from ..nn.linear import Linear, QuantLinear
from .llama import LlamaConfig

__all__ = [
    "import_reference_quantized",
    "qtensor_from_reference_state",
    "pack_rows",
    "unpack_rows",
    "export_gptq",
    "import_gptq",
]


def _dec_str(t) -> str:
    return "".join(chr(int(i)) for i in np.asarray(t).reshape(-1))


def _dec_int(t) -> int:
    return int(np.asarray(t))


def qtensor_from_reference_state(
    sd: Dict[str, Any], compute_dtype=jnp.bfloat16
) -> QTensor:
    """Build a QTensor from a reference HQQLinear state dict
    (keys per `/root/reference/hqq/core/quantize.py:615-680`)."""

    def np_of(key):
        v = sd[key]
        if hasattr(v, "detach"):
            v = v.detach().cpu()
            if v.dtype in (getattr(__import__("torch"), "bfloat16"),):
                v = v.float()
            v = v.numpy()
        return np.asarray(v)

    nbits_raw = sd["nbits"]
    nbits = float(np.asarray(nbits_raw.detach().cpu() if hasattr(nbits_raw, "detach") else nbits_raw))
    nbits = int(nbits) if nbits.is_integer() else nbits

    packing = BIT_TO_PACKING[nbits]
    shape = tuple(int(x) for x in np.asarray(
        sd["shape"].detach().cpu() if hasattr(sd["shape"], "detach") else sd["shape"]
    ).reshape(-1))
    group_size = _dec_int(sd["group_size"]) if "group_size" in sd else None
    if group_size == 0:
        group_size = None
    axis = _dec_int(sd["axis"])

    wq = np_of("W_q")
    # view_as_float storage: packed ints viewed as the compute dtype
    # (`core/quantize.py:167-176`) — undo the view.
    view_as_float = bool(_dec_int(sd["view_as_float"])) if "view_as_float" in sd else False
    if view_as_float or wq.dtype.kind == "f":
        container = np.int32 if packing == "3bit_32" else np.uint8
        wq = wq.view(container)

    return QTensor(
        wq=jnp.asarray(wq),
        scale=jnp.asarray(np_of("scale").astype(np.float32)),
        zero=jnp.asarray(np_of("zero").astype(np.float32)),
        nbits=nbits,
        group_size=group_size,
        axis=axis,
        shape=shape,
        packing=packing,
        compute_dtype=compute_dtype,
    )


def import_reference_quantized(
    model_dir: str, compute_dtype=jnp.bfloat16
) -> Tuple[dict, LlamaConfig]:
    """Load a reference-HQQ quantized Llama checkpoint directory
    (config.json + qmodel.pt) into an hqq_tpu param pytree."""
    import torch

    with open(os.path.join(model_dir, "config.json")) as f:
        cfg = LlamaConfig.from_hf(json.load(f))

    weights = torch.load(
        os.path.join(model_dir, "qmodel.pt"), map_location="cpu", weights_only=False
    )

    def get_linear(name: str):
        sd = weights[name]
        if "W_q" in sd:
            qt = qtensor_from_reference_state(sd, compute_dtype)
            bias = sd.get("bias")
            if bias is not None and hasattr(bias, "numpy"):
                bias = jnp.asarray(bias.float().numpy(), compute_dtype)
            return QuantLinear(qweight=qt, bias=bias)
        w = jnp.asarray(sd["weight"].float().numpy(), compute_dtype)
        b = sd.get("bias")
        return Linear(
            weight=w,
            bias=None if b is None else jnp.asarray(b.float().numpy(), compute_dtype),
        )

    def get_array(name: str, key: str = "weight"):
        return jnp.asarray(weights[name][key].float().numpy(), compute_dtype)

    layers = []
    for i in range(cfg.num_hidden_layers):
        p = f"model.layers.{i}"
        layers.append(
            {
                "self_attn": {
                    f"{t}_proj": get_linear(f"{p}.self_attn.{t}_proj")
                    for t in ("q", "k", "v", "o")
                },
                "mlp": {
                    f"{t}_proj": get_linear(f"{p}.mlp.{t}_proj")
                    for t in ("gate", "up", "down")
                },
                "input_layernorm": get_array(f"{p}.input_layernorm"),
                "post_attention_layernorm": get_array(f"{p}.post_attention_layernorm"),
            }
        )

    params = {
        "embed_tokens": get_array("model.embed_tokens"),
        "layers": layers,
        "norm": get_array("model.norm"),
    }
    if "lm_head" in weights:
        params["lm_head"] = get_linear("lm_head")
    return params, cfg


# ---------------------------------------------------------------------------
# GPTQ-layout interop (the reference's second packing, used by its vLLM path:
# `/root/reference/hqq/utils/vllm.py:53-99` pack-over-rows int32 words)
# ---------------------------------------------------------------------------


def pack_rows(codes: np.ndarray, nbits: int) -> np.ndarray:
    """Pack integer codes [K, N] over rows into int32 words [K/e, N] with
    e = 32 // nbits; element j of a word sits at bits [j*nbits, (j+1)*nbits)
    (GPTQ convention, ≙ `utils/vllm.py:80-99`)."""
    assert 32 % nbits == 0, "GPTQ packing needs nbits dividing 32"
    e = 32 // nbits
    k, n = codes.shape
    assert k % e == 0, f"K={k} not divisible by {e}"
    c = codes.astype(np.uint32).reshape(k // e, e, n)
    out = np.zeros((k // e, n), np.uint32)
    for j in range(e):
        out |= c[:, j, :] << (j * nbits)
    return out.view(np.int32)


def unpack_rows(packed: np.ndarray, nbits: int, k: int, n: int) -> np.ndarray:
    """Inverse of `pack_rows` (≙ `utils/vllm.py:53-69`)."""
    e = 32 // nbits
    mask = (1 << nbits) - 1
    p = packed.view(np.uint32)
    out = np.empty((p.shape[0], e, n), np.uint8)
    for j in range(e):
        out[:, j, :] = (p >> (j * nbits)) & mask
    return out.reshape(k, n)


def export_gptq(qt: QTensor) -> Dict[str, np.ndarray]:
    """Export an axis=1 QTensor to GPTQ tensor conventions
    (qweight int32 [K/e, N], qzeros int32 [K/g, N/e], scales [K/g, N]):
    loadable by vLLM/AutoGPTQ-style consumers. Requires integral zeros —
    quantize with round_zero=True, optimize=False (the proximal solver moves
    zeros off-integer; the reference's vLLM path ships float zeros as extra
    params for exactly this reason, `utils/vllm.py:184-377`). Dequant
    convention matches: w = (q - z) * scale."""
    from ..core.quantize import resolve_meta, unpack_codes

    qt = resolve_meta(qt)
    assert qt.axis == 1 and qt.group_size is not None, "GPTQ export needs axis=1 groups"
    n_out, k = qt.shape  # torch convention [out, in]
    g = qt.group_size
    nbits = int(qt.nbits)
    assert float(qt.nbits).is_integer() and 32 % nbits == 0

    codes = np.asarray(unpack_codes(qt, jnp.int32)).reshape(n_out, k).T  # [K, N]
    scales = np.asarray(qt.scale, np.float32).reshape(n_out, k // g).T  # [K/g, N]
    zeros = np.asarray(qt.zero, np.float32).reshape(n_out, k // g).T
    zint = np.round(zeros)
    assert np.abs(zeros - zint).max() < 1e-4, (
        "GPTQ export requires integral zero-points (use round_zero=True)"
    )
    return {
        "qweight": pack_rows(codes, nbits),
        # qzeros pack along N: int32 [K/g, N/e]
        "qzeros": pack_rows(zint.T.astype(np.int64), nbits).T.copy(),
        "scales": scales.astype(np.float16),
        "g_idx": np.arange(k, dtype=np.int32) // g,
    }


def import_gptq(
    tensors: Dict[str, np.ndarray],
    nbits: int,
    group_size: int,
    compute_dtype=jnp.bfloat16,
) -> QTensor:
    """Build a QTensor from GPTQ-convention tensors (inverse of export_gptq,
    modern no-offset qzeros convention)."""
    from ..core import bitpack

    qweight = np.asarray(tensors["qweight"])
    scales = np.asarray(tensors["scales"], np.float32)  # [K/g, N]
    e = 32 // nbits
    k = qweight.shape[0] * e
    n = qweight.shape[1]
    codes_kn = unpack_rows(qweight, nbits, k, n)  # [K, N]
    zeros_kn = unpack_rows(
        np.ascontiguousarray(np.asarray(tensors["qzeros"]).T), nbits, n, k // group_size
    ).T  # [K/g, N]

    codes = codes_kn.T.reshape(-1, group_size)  # group space [N*K/g, g]
    scale = scales.T.reshape(-1, 1)
    zero = zeros_kn.T.reshape(-1, 1).astype(np.float32)

    packing = BIT_TO_PACKING[nbits]
    wq = bitpack.pack(jnp.asarray(codes, jnp.int32), packing)
    return QTensor(
        wq=wq,
        scale=jnp.asarray(scale),
        zero=jnp.asarray(zero),
        nbits=nbits,
        group_size=group_size,
        axis=1,
        shape=(n, k),
        packing=packing,
        compute_dtype=compute_dtype,
    )
