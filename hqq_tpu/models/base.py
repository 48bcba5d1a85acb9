# SPDX-License-Identifier: Apache-2.0
"""Model-level quantization: param-tree patching, save/load.

≙ `/root/reference/hqq/models/base.py` (`BasePatch.patch_linearlayers`,
`BaseHQQModel.quantize_model/save_quantized/from_quantized`). The reference
mutates an nn.Module graph with setattr; here a model is a parameter pytree
and quantization is a pure tree transformation: every `Linear` leaf whose
*linear tag* (trailing module path with layer indices stripped, ≙
`name_to_linear_tag`, ref `models/base.py:61-68`) matches the quant config is
replaced by a `QuantLinear`. Per-tag configs with `None` meaning "skip" are
supported exactly like the reference (`models/base.py:282-289`).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Union


from ..core.quantize import BaseQuantizeConfig
from ..nn.linear import Linear, QuantLinear
from .serialize import load_checkpoint, save_checkpoint

__all__ = [
    "name_to_linear_tag",
    "iter_linears",
    "patch_linears",
    "quantize_model",
    "save_quantized",
    "from_quantized",
]

# Linears never quantized by default (≙ `_IGNORE_LINEAR`, ref models/base.py:43)
IGNORE_LINEAR = ("lm_head",)


def name_to_linear_tag(path: str) -> str:
    """'layers.11.self_attn.q_proj' -> 'self_attn.q_proj'
    (≙ ref `models/base.py:61-68`: strips 'model'/'layers'/indices)."""
    parts = [
        p for p in path.split(".") if p not in ("model", "layers") and not p.isdigit()
    ]
    return ".".join(parts)


def _walk(tree: Any, path: str, fn: Callable[[str, Any], Any]) -> Any:
    """Depth-first map over dict/list containers, applying fn to non-container
    nodes (Linear/QuantLinear/arrays)."""
    if isinstance(tree, dict):
        return {k: _walk(v, f"{path}.{k}" if path else k, fn) for k, v in tree.items()}
    if isinstance(tree, list):
        return [_walk(v, f"{path}.{i}" if path else str(i), fn) for i, v in enumerate(tree)]
    return fn(path, tree)


def iter_linears(params: Any):
    """Yield (path, layer) for every Linear/QuantLinear leaf."""
    found = []

    def visit(path, node):
        if isinstance(node, (Linear, QuantLinear)):
            found.append((path, node))
        return node

    _walk(params, "", visit)
    return found


def get_linear_tags(params: Any, ignore=IGNORE_LINEAR) -> list[str]:
    """Unique linear tags in traversal order (≙ `get_linear_tags_from_model`)."""
    tags: list[str] = []
    for path, _ in iter_linears(params):
        tag = name_to_linear_tag(path)
        if tag in tags or any(ig in path for ig in ignore):
            continue
        tags.append(tag)
    return tags


def patch_linears(
    params: Any, fn: Callable[[str, Union[Linear, QuantLinear]], Any]
) -> Any:
    """Replace every linear leaf with fn(path, leaf)
    (≙ `patch_linearlayers`, ref `models/base.py:134-161`)."""

    def visit(path, node):
        if isinstance(node, (Linear, QuantLinear)):
            return fn(path, node)
        return node

    return _walk(params, "", visit)


def quantize_model(
    params: Any,
    quant_config: Union[dict, None] = None,
    compute_dtype=None,
    ignore=IGNORE_LINEAR,
    progress: bool = False,
) -> Any:
    """Quantize every (non-ignored) Linear leaf of a model pytree.

    quant_config: either a `BaseQuantizeConfig(...)` dict applied uniformly,
    or a {linear_tag: config-or-None} dict for per-tag control (None skips
    that tag) — ≙ ref `models/base.py:266-289`.
    """
    if quant_config is None:
        quant_config = BaseQuantizeConfig()

    if "weight_quant_params" in quant_config:
        tags = get_linear_tags(params, ignore)
        patch_params: Dict[str, Optional[dict]] = {t: quant_config for t in tags}
    else:
        patch_params = dict(quant_config)

    it = iter_linears(params)
    bar = None
    if progress:
        try:
            from tqdm import tqdm

            bar = tqdm(total=len(it), desc="quantizing")
        except Exception:
            bar = None

    def quantize_leaf(path, layer):
        if bar is not None:
            bar.update(1)
        if any(ig in path for ig in ignore):
            return layer
        if not isinstance(layer, Linear):
            return layer  # already quantized or foreign
        cfg = patch_params.get(name_to_linear_tag(path))
        if cfg is None:
            return layer
        return QuantLinear.quantize(
            layer.weight, layer.bias, quant_config=cfg, compute_dtype=compute_dtype
        )

    out = patch_linears(params, quantize_leaf)
    if bar is not None:
        bar.close()
    from ..utils.profiling import log_event

    log_event("quantize_model", tags=list(patch_params), n_linears=len(it))
    return out


def save_quantized(params: Any, save_dir: str, config: Optional[dict] = None) -> None:
    """≙ `BaseHQQModel.save_quantized` (ref `models/base.py:424-434`)."""
    from ..utils.profiling import log_event

    log_event("save_quantized", save_dir=save_dir)
    save_checkpoint(save_dir, params, config=config)


def from_quantized(save_dir: str, device_put=None):
    """≙ `BaseHQQModel.from_quantized` (ref `models/base.py:463-543`).
    Returns (params, config_dict)."""
    return load_checkpoint(save_dir, device_put=device_put)
