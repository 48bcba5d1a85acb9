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
    "qtensor_to_reference_state",
    "export_reference_quantized",
    "pack_rows",
    "unpack_rows",
    "export_gptq",
    "import_gptq",
    "save_to_gptq",
    "load_gptq",
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
        # ascontiguousarray: transposed views are Fortran-ordered and
        # byte-dump serializers (safetensors) would write the base buffer
        "qweight": np.ascontiguousarray(pack_rows(codes, nbits)),
        # qzeros pack along N: int32 [K/g, N/e]
        "qzeros": np.ascontiguousarray(pack_rows(zint.T.astype(np.int64), nbits).T),
        "scales": np.ascontiguousarray(scales.astype(np.float16)),
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


# ---------------------------------------------------------------------------
# Reverse interop: EXPORT to the reference's checkpoint format (config.json
# + qmodel.pt) so a model quantized on TPU round-trips to the GPU stack —
# inverse of `import_reference_quantized`. Format per
# `/root/reference/hqq/models/base.py:403-434` (torch.save of
# {module_name: encoded state dict}) and the HQQLinear state-dict schema
# (`/root/reference/hqq/core/quantize.py:615-680`, scalar encoding
# `core/utils.py:36-68`).
# ---------------------------------------------------------------------------


def qtensor_to_reference_state(
    qlin: QuantLinear, torch_dtype_name: str = "torch.float16"
) -> Dict[str, Any]:
    """Encode one QuantLinear as a reference HQQLinear state dict."""
    import torch

    from ..core import bitpack
    from ..core.quantize import resolve_meta, unpack_codes

    qt = resolve_meta(qlin.qweight)
    if qt.pack_blocks != 1:  # undo GSPMD block-local repacking (ref layout)
        codes = unpack_codes(qt, jnp.int32)
        import dataclasses as _dc

        qt = _dc.replace(
            qt, wq=bitpack.pack(codes.astype(jnp.int32), qt.packing), pack_blocks=1
        )
    assert float(qt.nbits).is_integer(), "reference export needs integer nbits"

    def enc_int(v):
        return torch.tensor(int(v), dtype=torch.int32)

    def enc_bool(v):
        return torch.tensor(int(bool(v)), dtype=torch.uint8)

    def enc_str(v):
        return torch.tensor([ord(c) for c in v], dtype=torch.uint8)

    unpack_view = {"3bit_32": "torch.int32"}.get(qt.packing, "torch.uint8")
    n_out, k = qt.shape
    g = qt.group_size if qt.group_size is not None else (k if qt.axis == 1 else n_out)
    state: Dict[str, Any] = {
        "W_q": torch.from_numpy(np.asarray(qt.wq).copy()),
        "scale": torch.from_numpy(np.asarray(qt.scale, np.float32).copy()),
        "zero": torch.from_numpy(np.asarray(qt.zero, np.float32).copy()),
        "nbits": enc_int(qt.nbits),
        "group_size": enc_int(g),
        "shape": torch.tensor([n_out, k]),
        "axis": enc_int(qt.axis),
        "packing": enc_str(qt.packing),
        "unpack_view_dtype": enc_str(unpack_view),
        "view_as_float": enc_bool(False),
        "quant_zero": enc_bool(False),
        "quant_scale": enc_bool(False),
        "compute_dtype": enc_str(torch_dtype_name),
        "offload_meta": enc_bool(False),
        "encoded_state_dict": enc_bool(True),
        "stores_quant_config": enc_bool(True),
        # weight_quant_params (keys overlap meta on purpose, as the
        # reference's own state_dict does)
        "channel_wise": enc_bool(qt.channel_wise),
        "optimize": enc_bool(True),
        "round_zero": enc_bool(int(qt.nbits) == 4),
    }
    if qlin.bias is not None:
        state["bias"] = torch.from_numpy(
            np.asarray(qlin.bias, np.float32).copy()
        )
    return state


def export_reference_quantized(
    params: dict, cfg: LlamaConfig, save_dir: str,
    torch_dtype_name: str = "torch.float16",
) -> None:
    """Write a Llama-family quantized param tree as a reference-HQQ
    checkpoint directory (config.json + qmodel.pt) loadable by
    `AutoHQQHFModel.from_quantized` on the GPU stack."""
    import torch

    os.makedirs(save_dir, exist_ok=True)
    hf_cfg = {
        "architectures": ["LlamaForCausalLM"],
        "model_type": "llama",
        "vocab_size": cfg.vocab_size,
        "hidden_size": cfg.hidden_size,
        "intermediate_size": cfg.intermediate_size,
        "num_hidden_layers": cfg.num_hidden_layers,
        "num_attention_heads": cfg.num_attention_heads,
        "num_key_value_heads": cfg.num_key_value_heads,
        "head_dim": cfg.head_dim_,
        "max_position_embeddings": cfg.max_position_embeddings,
        "rms_norm_eps": cfg.rms_norm_eps,
        "rope_theta": cfg.rope_theta,
        "tie_word_embeddings": cfg.tie_word_embeddings,
        "attention_bias": cfg.attention_bias,
        "mlp_bias": cfg.mlp_bias,
        "hidden_act": "silu",
        "torch_dtype": torch_dtype_name.split(".")[-1],
    }
    with open(os.path.join(save_dir, "config.json"), "w") as f:
        json.dump(hf_cfg, f, indent=1)

    def plain(name, arr):
        return {"weight": torch.from_numpy(np.asarray(arr, np.float32).copy())}

    weights: Dict[str, Any] = {
        "model.embed_tokens": plain("embed", params["embed_tokens"]),
        "model.norm": plain("norm", params["norm"]),
    }
    for i, layer in enumerate(params["layers"]):
        p = f"model.layers.{i}"
        for grp, tags in (("self_attn", ("q", "k", "v", "o")),
                          ("mlp", ("gate", "up", "down"))):
            for t in tags:
                mod = layer[grp][f"{t}_proj"]
                name = f"{p}.{grp}.{t}_proj"
                if isinstance(mod, QuantLinear):
                    weights[name] = qtensor_to_reference_state(mod, torch_dtype_name)
                else:
                    weights[name] = {
                        "weight": torch.from_numpy(
                            np.asarray(mod.weight, np.float32).copy()
                        )
                    }
                    if mod.bias is not None:
                        weights[name]["bias"] = torch.from_numpy(
                            np.asarray(mod.bias, np.float32).copy()
                        )
        weights[f"{p}.input_layernorm"] = plain("ln", layer["input_layernorm"])
        weights[f"{p}.post_attention_layernorm"] = plain(
            "ln", layer["post_attention_layernorm"]
        )
    if "lm_head" in params:
        head = params["lm_head"]
        w = head.weight if isinstance(head, Linear) else head
        weights["lm_head"] = {
            "weight": torch.from_numpy(np.asarray(w, np.float32).copy())
        }
    torch.save(weights, os.path.join(save_dir, "qmodel.pt"))


def save_to_gptq(params: dict, cfg: LlamaConfig, save_dir: str,
                 shard_layers: int = 8) -> None:
    """Model-level GPTQ export: sharded safetensors + index in AutoGPTQ/vLLM
    conventions (qweight/qzeros/scales/g_idx per linear, fp16 elsewhere)
    ≙ the ecosystem-facing half of `save_to_safetensors`
    (`/root/reference/hqq/models/base.py:545-647`) combined with the
    reference's GPTQ repack (`utils/vllm.py:80-99`). Requires axis=1 grouped
    integral-zero quantization (round_zero=True, optimize=False)."""
    from safetensors.numpy import save_file

    os.makedirs(save_dir, exist_ok=True)

    def linear_tensors(name: str, mod) -> Dict[str, np.ndarray]:
        if isinstance(mod, QuantLinear):
            t = export_gptq(mod.qweight)
            out = {f"{name}.{k}": v for k, v in t.items()}
            if mod.bias is not None:
                out[f"{name}.bias"] = np.asarray(mod.bias, np.float16)
            return out
        out = {f"{name}.weight": np.asarray(mod.weight, np.float16)}
        if mod.bias is not None:
            out[f"{name}.bias"] = np.asarray(mod.bias, np.float16)
        return out

    shards: list[Dict[str, np.ndarray]] = []
    current: Dict[str, np.ndarray] = {
        "model.embed_tokens.weight": np.asarray(params["embed_tokens"], np.float16),
    }
    for i, layer in enumerate(params["layers"]):
        if i and i % shard_layers == 0:
            shards.append(current)
            current = {}
        p = f"model.layers.{i}"
        for grp, tags in (("self_attn", ("q", "k", "v", "o")),
                          ("mlp", ("gate", "up", "down"))):
            for t in tags:
                current.update(
                    linear_tensors(f"{p}.{grp}.{t}_proj", layer[grp][f"{t}_proj"])
                )
        current[f"{p}.input_layernorm.weight"] = np.asarray(
            layer["input_layernorm"], np.float16)
        current[f"{p}.post_attention_layernorm.weight"] = np.asarray(
            layer["post_attention_layernorm"], np.float16)
    current["model.norm.weight"] = np.asarray(params["norm"], np.float16)
    if "lm_head" in params:
        head = params["lm_head"]
        w = head.weight if isinstance(head, Linear) else head
        current["lm_head.weight"] = np.asarray(w, np.float16)
    shards.append(current)

    n = len(shards)
    weight_map = {}
    total = 0
    for si, shard in enumerate(shards):
        fname = f"model-{si + 1:05d}-of-{n:05d}.safetensors"
        save_file(shard, os.path.join(save_dir, fname))
        for k, v in shard.items():
            weight_map[k] = fname
            total += v.nbytes
    with open(os.path.join(save_dir, "model.safetensors.index.json"), "w") as f:
        json.dump({"metadata": {"total_size": total},
                   "weight_map": weight_map}, f, indent=1)

    # quantization_config in the HF/AutoGPTQ convention
    any_qt = next(
        layer["self_attn"]["q_proj"].qweight
        for layer in params["layers"]
        if isinstance(layer["self_attn"]["q_proj"], QuantLinear)
    )
    hf_cfg = {
        "architectures": ["LlamaForCausalLM"],
        "model_type": "llama",
        "vocab_size": cfg.vocab_size,
        "hidden_size": cfg.hidden_size,
        "intermediate_size": cfg.intermediate_size,
        "num_hidden_layers": cfg.num_hidden_layers,
        "num_attention_heads": cfg.num_attention_heads,
        "num_key_value_heads": cfg.num_key_value_heads,
        "max_position_embeddings": cfg.max_position_embeddings,
        "rms_norm_eps": cfg.rms_norm_eps,
        "rope_theta": cfg.rope_theta,
        "tie_word_embeddings": cfg.tie_word_embeddings,
        "quantization_config": {
            "quant_method": "gptq",
            "bits": int(any_qt.nbits),
            "group_size": any_qt.group_size,
            "desc_act": False,
            "sym": False,
        },
    }
    with open(os.path.join(save_dir, "config.json"), "w") as f:
        json.dump(hf_cfg, f, indent=1)


def load_gptq(
    model_dir: str, compute_dtype=jnp.bfloat16
) -> Tuple[dict, LlamaConfig]:
    """Load a GPTQ-convention Llama checkpoint directory (sharded safetensors
    + index + HF config with `quantization_config`) into an hqq_tpu param
    pytree — the entry point for the large AutoGPTQ/vLLM checkpoint
    ecosystem (and the inverse of `save_to_gptq`). Quantized linears become
    `QuantLinear`s ready for `prepare_for_inference("w4a8")`."""
    from safetensors.numpy import load_file

    with open(os.path.join(model_dir, "config.json")) as f:
        hf_cfg = json.load(f)
    cfg = LlamaConfig.from_hf(hf_cfg)
    qc = hf_cfg.get("quantization_config", {})
    nbits = int(qc.get("bits", 4))
    group_size = int(qc.get("group_size", 128))

    idx_path = os.path.join(model_dir, "model.safetensors.index.json")
    tensors: Dict[str, np.ndarray] = {}
    if os.path.exists(idx_path):
        with open(idx_path) as f:
            index = json.load(f)
        for fname in sorted(set(index["weight_map"].values())):
            tensors.update(load_file(os.path.join(model_dir, fname)))
    else:
        tensors.update(load_file(os.path.join(model_dir, "model.safetensors")))

    def get_linear(name: str):
        if f"{name}.qweight" in tensors:
            qt = import_gptq(
                {k: tensors[f"{name}.{k}"] for k in ("qweight", "qzeros", "scales")},
                nbits=nbits,
                group_size=group_size,
                compute_dtype=compute_dtype,
            )
            bias = tensors.get(f"{name}.bias")
            return QuantLinear(
                qweight=qt,
                bias=None if bias is None else jnp.asarray(bias, compute_dtype),
            )
        w = jnp.asarray(tensors[f"{name}.weight"], compute_dtype)
        bias = tensors.get(f"{name}.bias")
        return Linear(
            weight=w,
            bias=None if bias is None else jnp.asarray(bias, compute_dtype),
        )

    def arr(name):
        return jnp.asarray(tensors[name], compute_dtype)

    layers = []
    for i in range(cfg.num_hidden_layers):
        p = f"model.layers.{i}"
        layers.append({
            "self_attn": {
                f"{t}_proj": get_linear(f"{p}.self_attn.{t}_proj")
                for t in ("q", "k", "v", "o")
            },
            "mlp": {
                f"{t}_proj": get_linear(f"{p}.mlp.{t}_proj")
                for t in ("gate", "up", "down")
            },
            "input_layernorm": arr(f"{p}.input_layernorm.weight"),
            "post_attention_layernorm": arr(f"{p}.post_attention_layernorm.weight"),
        })

    params = {
        "embed_tokens": arr("model.embed_tokens.weight"),
        "layers": layers,
        "norm": arr("model.norm.weight"),
    }
    if "lm_head.weight" in tensors:
        params["lm_head"] = Linear(weight=arr("lm_head.weight"))
    return params, cfg
