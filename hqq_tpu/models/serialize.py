# SPDX-License-Identifier: Apache-2.0
"""Checkpoint serialization: param pytrees <-> sharded safetensors.

≙ the reference's save/load stack (`/root/reference/hqq/models/base.py:403-647`
`serialize_weights` / `save_quantized` / `from_quantized` /
`save_to_safetensors`, plus the scalar<->tensor encoding in
`core/utils.py:36-68`). The TPU design is simpler and fully declarative: the
tree structure and all static metadata (quant configs, dtypes, shapes) go into
a JSON sidecar, arrays go into sharded `model-XXXXX-of-YYYYY.safetensors`
files with dotted-path keys — directly inspectable with any safetensors
tooling, no pickle anywhere (the reference's `qmodel.pt` is torch.save).
"""

from __future__ import annotations

import json
import os
from typing import Any, Callable, Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..core.quantize import QTensor
from ..nn.linear import Linear, QuantLinear

__all__ = [
    "tree_to_state",
    "state_to_tree",
    "save_checkpoint",
    "load_checkpoint",
]

_DTYPE_NAMES = {
    "bfloat16": jnp.bfloat16,
    "float16": jnp.float16,
    "float32": jnp.float32,
    "uint8": jnp.uint8,
    "int8": jnp.int8,
    "int32": jnp.int32,
    "uint32": jnp.uint32,
}


def _dtype_name(dt) -> str:
    return jnp.dtype(dt).name


def tree_to_state(tree: Any, prefix: str = "") -> Tuple[Dict[str, Any], Any]:
    """Flatten a param tree into (flat array dict, JSON-able structure).

    Recognized nodes: dict, list/tuple, Linear, QuantLinear, QTensor, arrays
    and None. Unknown leaf types raise.
    """
    flat: Dict[str, Any] = {}

    def rec(node, path):
        if node is None:
            return {"type": "none"}
        if isinstance(node, dict):
            return {
                "type": "dict",
                "children": {
                    k: rec(v, f"{path}.{k}" if path else k) for k, v in node.items()
                },
            }
        if isinstance(node, (list, tuple)):
            return {
                "type": "list",
                "children": [
                    rec(v, f"{path}.{i}" if path else str(i))
                    for i, v in enumerate(node)
                ],
            }
        if isinstance(node, QuantLinear):
            return {
                "type": "QuantLinear",
                "children": {
                    "qweight": rec(node.qweight, f"{path}.qweight"),
                    "bias": rec(node.bias, f"{path}.bias"),
                },
            }
        if type(node).__name__ in ("PallasQuantLinear", "A8QuantLinear"):
            return {
                "type": type(node).__name__,
                "children": {
                    "kqt": rec(node.kqt, f"{path}.kqt"),
                    "bias": rec(node.bias, f"{path}.bias"),
                },
            }
        if type(node).__name__ == "KernelQTensor":
            flat[f"{path}.wq"] = node.wq
            flat[f"{path}.scale"] = node.scale
            flat[f"{path}.zs"] = node.zs
            return {
                "type": "KernelQTensor",
                "meta": {
                    "nbits": node.nbits,
                    "container_bits": node.container_bits,
                    "group_size": node.group_size,
                    "shape": list(node.shape),
                    "compute_dtype": _dtype_name(node.compute_dtype),
                    "bc4": bool(node.bc4),
                },
            }
        if type(node).__name__ == "Int8QuantLinear":
            flat[f"{path}.w8"] = node.w8
            flat[f"{path}.sw"] = node.sw
            return {
                "type": "Int8QuantLinear",
                "meta": {
                    "compute_dtype": _dtype_name(node.compute_dtype),
                    "logical_out": node.logical_out,
                    "logical_in": node.logical_in,
                },
                "children": {"bias": rec(node.bias, f"{path}.bias")},
            }
        if type(node).__name__ == "LoRALinear":
            return {
                "type": "LoRALinear",
                "meta": {"scaling": node.scaling, "dropout": node.dropout},
                "children": {
                    "base": rec(node.base, f"{path}.base"),
                    "lora_a": rec(node.lora_a, f"{path}.lora_a"),
                    "lora_b": rec(node.lora_b, f"{path}.lora_b"),
                    "bias": rec(node.bias, f"{path}.bias"),
                },
            }
        if type(node).__name__ == "GroupedLinear":
            return {
                "type": "GroupedLinear",
                "children": {
                    "weight": rec(node.weight, f"{path}.weight"),
                    "bias": rec(node.bias, f"{path}.bias"),
                },
            }
        if type(node).__name__ == "GroupedQuantLinear":
            flat[f"{path}.W_q"] = node.wq
            flat[f"{path}.scale"] = node.scale
            flat[f"{path}.zero"] = node.zero
            return {
                "type": "GroupedQuantLinear",
                "meta": {
                    "nbits": node.nbits,
                    "group_size": node.group_size,
                    "axis": node.axis,
                    "shape": list(node.shape),
                    "packing": node.packing,
                    "compute_dtype": _dtype_name(node.compute_dtype),
                },
            }
        if isinstance(node, Linear):
            return {
                "type": "Linear",
                "children": {
                    "weight": rec(node.weight, f"{path}.weight"),
                    "bias": rec(node.bias, f"{path}.bias"),
                },
            }
        if isinstance(node, QTensor):
            # W_q/scale/zero array names mirror the reference state_dict keys
            # (`/root/reference/hqq/core/quantize.py:615-680`). Meta-quantized
            # scale/zero (nested QTensors, ≙ ref scale_q/zero_q) recurse.
            flat[f"{path}.W_q"] = node.wq
            children = {}
            if isinstance(node.scale, QTensor):
                children["scale_q"] = rec(node.scale, f"{path}.scale_q")
            else:
                flat[f"{path}.scale"] = node.scale
            if isinstance(node.zero, QTensor):
                children["zero_q"] = rec(node.zero, f"{path}.zero_q")
            else:
                flat[f"{path}.zero"] = node.zero
            return {
                "type": "QTensor",
                "children": children,
                "meta": {
                    "nbits": node.nbits,
                    "group_size": node.group_size,
                    "axis": node.axis,
                    "shape": list(node.shape),
                    "packing": node.packing,
                    "compute_dtype": _dtype_name(node.compute_dtype),
                    "channel_wise": node.channel_wise,
                    "pack_blocks": node.pack_blocks,
                },
            }
        if hasattr(node, "shape") and hasattr(node, "dtype"):
            flat[path] = node
            return {"type": "array", "dtype": _dtype_name(node.dtype)}
        raise TypeError(f"Unsupported leaf at {path!r}: {type(node)}")

    structure = rec(tree, prefix)
    return flat, structure


def state_to_tree(
    structure: Any, get: Callable[[str], Any], prefix: str = ""
) -> Any:
    """Rebuild a param tree from a structure dict and an array getter."""

    def rec(node, path):
        t = node["type"]
        if t == "none":
            return None
        if t == "dict":
            return {
                k: rec(v, f"{path}.{k}" if path else k)
                for k, v in node["children"].items()
            }
        if t == "list":
            return [
                rec(v, f"{path}.{i}" if path else str(i))
                for i, v in enumerate(node["children"])
            ]
        if t == "QuantLinear":
            return QuantLinear(
                qweight=rec(node["children"]["qweight"], f"{path}.qweight"),
                bias=rec(node["children"]["bias"], f"{path}.bias"),
            )
        if t in ("PallasQuantLinear", "A8QuantLinear"):
            from ..backends.pallas_backend import A8QuantLinear, PallasQuantLinear

            cls_ = PallasQuantLinear if t == "PallasQuantLinear" else A8QuantLinear
            return cls_(
                kqt=rec(node["children"]["kqt"], f"{path}.kqt"),
                bias=rec(node["children"]["bias"], f"{path}.bias"),
            )
        if t == "KernelQTensor":
            from ..ops.fused_matmul import KernelQTensor

            m = node["meta"]
            nbits = m["nbits"]
            return KernelQTensor(
                wq=get(f"{path}.wq"),
                scale=get(f"{path}.scale"),
                zs=get(f"{path}.zs"),
                nbits=int(nbits) if float(nbits).is_integer() else float(nbits),
                container_bits=m["container_bits"],
                group_size=m["group_size"],
                shape=tuple(m["shape"]),
                compute_dtype=_DTYPE_NAMES[m["compute_dtype"]],
                bc4=bool(m.get("bc4", False)),
            )
        if t == "Int8QuantLinear":
            from ..backends.int8_backend import Int8QuantLinear

            return Int8QuantLinear(
                w8=get(f"{path}.w8"),
                sw=get(f"{path}.sw"),
                bias=rec(node["children"]["bias"], f"{path}.bias"),
                compute_dtype=_DTYPE_NAMES[node["meta"]["compute_dtype"]],
                logical_out=node["meta"].get("logical_out"),
                logical_in=node["meta"].get("logical_in"),
            )
        if t == "LoRALinear":
            from ..core.peft import LoRALinear

            return LoRALinear(
                base=rec(node["children"]["base"], f"{path}.base"),
                lora_a=rec(node["children"]["lora_a"], f"{path}.lora_a"),
                lora_b=rec(node["children"]["lora_b"], f"{path}.lora_b"),
                bias=rec(node["children"]["bias"], f"{path}.bias"),
                scaling=node["meta"]["scaling"],
                dropout=node["meta"]["dropout"],
            )
        if t == "GroupedLinear":
            from ..nn.moe import GroupedLinear

            return GroupedLinear(
                weight=rec(node["children"]["weight"], f"{path}.weight"),
                bias=rec(node["children"]["bias"], f"{path}.bias"),
            )
        if t == "GroupedQuantLinear":
            from ..nn.moe import GroupedQuantLinear

            m = node["meta"]
            nbits = m["nbits"]
            return GroupedQuantLinear(
                wq=get(f"{path}.W_q"),
                scale=get(f"{path}.scale"),
                zero=get(f"{path}.zero"),
                nbits=int(nbits) if float(nbits).is_integer() else float(nbits),
                group_size=m["group_size"],
                axis=m["axis"],
                shape=tuple(m["shape"]),
                packing=m["packing"],
                compute_dtype=_DTYPE_NAMES[m["compute_dtype"]],
            )
        if t == "Linear":
            return Linear(
                weight=rec(node["children"]["weight"], f"{path}.weight"),
                bias=rec(node["children"]["bias"], f"{path}.bias"),
            )
        if t == "QTensor":
            m = node["meta"]
            nbits = m["nbits"]
            children = node.get("children") or {}
            if "scale_q" in children:
                scale = rec(children["scale_q"], f"{path}.scale_q")
            else:
                scale = get(f"{path}.scale")
            if "zero_q" in children:
                zero = rec(children["zero_q"], f"{path}.zero_q")
            else:
                zero = get(f"{path}.zero")
            return QTensor(
                wq=get(f"{path}.W_q"),
                scale=scale,
                zero=zero,
                nbits=int(nbits) if float(nbits).is_integer() else float(nbits),
                group_size=m["group_size"],
                axis=m["axis"],
                shape=tuple(m["shape"]),
                packing=m["packing"],
                compute_dtype=_DTYPE_NAMES[m["compute_dtype"]],
                channel_wise=m.get("channel_wise", True),
                pack_blocks=m.get("pack_blocks", 1),
            )
        if t == "array":
            return get(path)
        raise TypeError(f"Unknown node type {t!r} at {path!r}")

    return rec(structure, prefix)


def _np(x) -> np.ndarray:
    arr = np.asarray(x)
    return arr


def save_checkpoint(
    save_dir: str,
    params: Any,
    config: Optional[dict] = None,
    max_shard_bytes: int = 4 * 1024**3,
) -> None:
    """Write params as sharded safetensors + `hqq_config.json` sidecar
    (structure, model config). ≙ `save_quantized`+`save_to_safetensors`
    (`/root/reference/hqq/models/base.py:424-434,545-647`)."""
    from safetensors.numpy import save_file

    os.makedirs(save_dir, exist_ok=True)
    flat, structure = tree_to_state(params)

    # Greedy sharding by size.
    shards: list[dict] = [{}]
    sizes = [0]
    for k, v in flat.items():
        nbytes = int(np.prod(v.shape)) * v.dtype.itemsize if v.ndim else v.dtype.itemsize
        if sizes[-1] + nbytes > max_shard_bytes and shards[-1]:
            shards.append({})
            sizes.append(0)
        shards[-1][k] = v
        sizes[-1] += nbytes

    n = len(shards)
    weight_map = {}
    for i, shard in enumerate(shards):
        fname = f"model-{i + 1:05d}-of-{n:05d}.safetensors"
        save_file({k: _np(v) for k, v in shard.items()}, os.path.join(save_dir, fname))
        for k in shard:
            weight_map[k] = fname

    with open(os.path.join(save_dir, "hqq_config.json"), "w") as f:
        json.dump(
            {
                "format": "hqq_tpu.v1",
                "structure": structure,
                "config": config or {},
                "weight_map": weight_map,
            },
            f,
            indent=1,
        )


def load_checkpoint(save_dir: str, device_put=None) -> Tuple[Any, dict]:
    """Load (params, config) written by `save_checkpoint`.

    `device_put`: optional fn(np_array, path) -> Array, e.g. to place shards
    directly onto a sharded device mesh at load time.
    """
    from safetensors.numpy import load_file

    with open(os.path.join(save_dir, "hqq_config.json")) as f:
        index = json.load(f)

    arrays: Dict[str, np.ndarray] = {}
    for fname in sorted(set(index["weight_map"].values())):
        arrays.update(load_file(os.path.join(save_dir, fname)))

    def get(path: str):
        arr = arrays[path]
        if device_put is not None:
            return device_put(arr, path)
        return jnp.asarray(arr)

    params = state_to_tree(index["structure"], get)
    return params, index.get("config", {})
