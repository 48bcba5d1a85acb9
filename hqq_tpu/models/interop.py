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

__all__ = ["import_reference_quantized", "qtensor_from_reference_state"]


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
