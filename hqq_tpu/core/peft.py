# SPDX-License-Identifier: Apache-2.0
"""HQQ+ — trainable low-rank adapters on quantized linears.

≙ `/root/reference/hqq/core/peft.py`: `HQQLinearLoRA` (out = base(x) +
(drop(x) @ A) @ B * alpha/r, A kaiming / B zeros, optional trainable bias),
`HQQLinearLoRAWithFakeQuant` (QAT-style merge + fake-quantize each forward),
and `PeftUtils` (add/merge/save/load per-linear-tag adapters).

TPU-native differences: layers are immutable pytrees; "training only the
adapters" is expressed with `TrainableParams` (a path-predicate partition of
the param tree into a flat list of trainable leaves + an inject function)
instead of requires_grad flags — the natural JAX idiom for
`jax.grad`/optax over a frozen backbone.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct
from jax import Array

from ..nn.linear import Linear, QuantLinear
from .quantize import QTensor, dequantize, quantize

__all__ = [
    "LoRALinear",
    "FakeQuantLoRALinear",
    "GroupedProjLinear",
    "PeftUtils",
    "TrainableParams",
    "lora_config",
]


def lora_config(
    r: int = 8,
    lora_alpha: int = 8,
    dropout: float = 0.0,
    train_dtype=jnp.float32,
    train_bias: bool = False,
) -> dict:
    """≙ the reference per-tag peft config dicts (`examples/hqq_plus.py`)."""
    return dict(
        r=r,
        lora_alpha=lora_alpha,
        dropout=dropout,
        train_dtype=train_dtype,
        train_bias=train_bias,
    )


@struct.dataclass
class LoRALinear:
    """LoRA wrapper over any linear-like pytree layer
    (≙ `HQQLinearLoRA`, ref `core/peft.py:32-224`).

    out = base(x) + (dropout(x) @ A) @ B * (alpha / r) [+ trainable bias]
    A: [in, r] kaiming-init, B: [r, out] zeros — so the wrap starts as a
    no-op. A/B train in `train_dtype` (fp32 default) regardless of the
    base compute dtype.
    """

    base: Any  # Linear | QuantLinear | PallasQuantLinear
    lora_a: Array  # [in, r]
    lora_b: Array  # [r, out]
    bias: Optional[Array] = None
    scaling: float = struct.field(pytree_node=False, default=1.0)
    dropout: float = struct.field(pytree_node=False, default=0.0)

    @property
    def in_features(self) -> int:
        return self.base.in_features

    @property
    def out_features(self) -> int:
        return self.base.out_features

    @classmethod
    def wrap(
        cls,
        base: Any,
        r: int = 8,
        lora_alpha: int = 8,
        dropout: float = 0.0,
        train_dtype=jnp.float32,
        train_bias: bool = False,
        key: Optional[Array] = None,
    ) -> "LoRALinear":
        key = key if key is not None else jax.random.PRNGKey(0)
        in_f, out_f = base.in_features, base.out_features
        # kaiming-uniform over fan_in (≙ ref `core/peft.py:93-100`)
        bound = float(np.sqrt(6.0 / in_f))
        lora_a = jax.random.uniform(
            key, (in_f, r), train_dtype, minval=-bound, maxval=bound
        )
        lora_b = jnp.zeros((r, out_f), train_dtype)
        bias = jnp.zeros((out_f,), train_dtype) if train_bias else None
        return cls(
            base=base,
            lora_a=lora_a,
            lora_b=lora_b,
            bias=bias,
            scaling=float(lora_alpha) / float(r),
            dropout=float(dropout),
        )

    def _delta(self, x: Array, rng: Optional[Array], deterministic: bool) -> Array:
        h = x.astype(self.lora_a.dtype)
        if self.dropout > 0.0 and not deterministic and rng is not None:
            keep = jax.random.bernoulli(rng, 1.0 - self.dropout, h.shape)
            h = jnp.where(keep, h / (1.0 - self.dropout), 0.0)
        return (h @ self.lora_a) @ self.lora_b * self.scaling

    def __call__(
        self, x: Array, rng: Optional[Array] = None, deterministic: bool = True
    ) -> Array:
        out = self.base(x)
        out = out + self._delta(x, rng, deterministic).astype(out.dtype)
        if self.bias is not None:
            out = out + self.bias.astype(out.dtype)
        return out

    def merged_weight(self, dtype=jnp.float32) -> Array:
        """W + (A@B)^T in torch convention [out, in]
        (≙ merge via identity-matmul, ref `core/peft.py:167-190`)."""
        w = self.base.dequantize(dtype) if hasattr(self.base, "dequantize") else (
            self.base.weight.astype(dtype)
        )
        return w + (self.lora_a @ self.lora_b).T.astype(dtype) * 1.0

    def merge_and_quantize(self, quant_config: Optional[dict] = None) -> QuantLinear:
        """Merge the adapter into the dequantized base and requantize
        (≙ `HQQLinearLoRA.merge_and_quantize`)."""
        w = self.merged_weight(jnp.float32)
        base_bias = getattr(self.base, "bias", None)
        bias = base_bias
        if self.bias is not None:
            bias = self.bias if bias is None else bias + self.bias
        if quant_config is None and isinstance(self.base, QuantLinear):
            qt = self.base.qweight
            return QuantLinear.quantize(
                w,
                bias,
                nbits=qt.nbits,
                group_size=qt.group_size,
                axis=qt.axis,
                round_zero=(qt.nbits == 4),
                compute_dtype=qt.compute_dtype,
            )
        return QuantLinear.quantize(w, bias, quant_config=quant_config)


@struct.dataclass
class FakeQuantLoRALinear:
    """QAT-style LoRA: merge W + AB then fake-quantize every forward
    (≙ `HQQLinearLoRAWithFakeQuant`, ref `core/peft.py:228-268`)."""

    base: Any
    lora_a: Array
    lora_b: Array
    scaling: float = struct.field(pytree_node=False, default=1.0)
    nbits: float = struct.field(pytree_node=False, default=4)
    group_size: int = struct.field(pytree_node=False, default=64)
    axis: int = struct.field(pytree_node=False, default=1)

    @classmethod
    def wrap(cls, lora: LoRALinear, nbits=4, group_size=64, axis=1):
        return cls(
            base=lora.base,
            lora_a=lora.lora_a,
            lora_b=lora.lora_b,
            scaling=lora.scaling,
            nbits=nbits,
            group_size=group_size,
            axis=axis,
        )

    def _fake_quant(self, w: Array) -> Array:
        """Straight-through fake quantization (quantize w/o packing ->
        dequantize; gradient passes through unchanged)."""

        def fq(w):
            qt = quantize(
                w,
                nbits=self.nbits,
                group_size=self.group_size,
                axis=self.axis,
                optimize=False,
                bitpack_weights=False,
                compute_dtype=jnp.float32,
            )
            return dequantize(qt, jnp.float32)

        return w + jax.lax.stop_gradient(fq(w) - w)

    def __call__(self, x: Array) -> Array:
        w = self.base.dequantize(jnp.float32) if hasattr(self.base, "dequantize") else self.base.weight
        w = w.astype(jnp.float32) + (self.lora_a @ self.lora_b).T * self.scaling
        w = self._fake_quant(w)
        out = x.astype(jnp.float32) @ w.T
        bias = getattr(self.base, "bias", None)
        if bias is not None:
            out = out + bias.astype(out.dtype)
        return out.astype(x.dtype)


@struct.dataclass
class GroupedProjLinear:
    """Learnable per-group projection matrices applied to the dequantized
    weight (≙ experimental `HQQLinearGroupedProj`, ref `core/peft.py:272-362`):

        W' = reshape( proj @ W.reshape(proj_num, proj_size, -1) )
        out = x @ W'^T + bias

    `proj` [proj_num, proj_size, proj_size] is identity-initialized and
    trainable; the quantized base stays frozen.
    """

    base: Any  # QuantLinear (frozen)
    proj: Array  # [proj_num, proj_size, proj_size]
    bias: Optional[Array] = None

    @classmethod
    def wrap(cls, layer: Any, proj_size: int = 8, train_dtype=jnp.float32):
        out_f = layer.out_features
        assert out_f % proj_size == 0, "proj_size must divide out_features"
        proj_num = out_f // proj_size
        proj = jnp.broadcast_to(
            jnp.eye(proj_size, dtype=train_dtype), (proj_num, proj_size, proj_size)
        )
        bias = getattr(layer, "bias", None)
        base = dataclasses.replace(layer, bias=None) if bias is not None else layer
        return cls(base=base, proj=jnp.array(proj), bias=bias)

    @property
    def in_features(self) -> int:
        return self.base.in_features

    @property
    def out_features(self) -> int:
        return self.base.out_features

    def projected_weight(self, dtype=jnp.float32) -> Array:
        w = (
            self.base.dequantize(jnp.float32)
            if hasattr(self.base, "dequantize")
            else self.base.weight.astype(jnp.float32)
        )
        pn, ps = self.proj.shape[0], self.proj.shape[1]
        w = jnp.matmul(self.proj.astype(jnp.float32), w.reshape(pn, ps, -1))
        return w.reshape(self.out_features, self.in_features).astype(dtype)

    def __call__(self, x: Array) -> Array:
        w = self.projected_weight(jnp.float32)
        out = x.astype(jnp.float32) @ w.T
        if self.bias is not None:
            out = out + self.bias.astype(out.dtype)
        return out.astype(x.dtype)


# ---------------------------------------------------------------------------
# Trainable-parameter partition (JAX idiom for requires_grad)
# ---------------------------------------------------------------------------

LORA_LEAF_NAMES = ("lora_a", "lora_b", "proj")


class TrainableParams:
    """Partition a param tree into trainable leaves (flat list) + inject().

    Default predicate selects LoRA A/B (and LoRA bias) leaves — everything
    else is the frozen quantized backbone (≙ `autoname_modules`+freeze,
    ref `core/peft.py:428-443`).
    """

    def __init__(
        self,
        params: Any,
        predicate: Optional[Callable[[str], bool]] = None,
    ):
        pred = predicate or (
            lambda p: p.endswith((".lora_a", ".lora_b"))
            or (".lora" in p and p.endswith(".bias"))
        )
        leaves, treedef = jax.tree_util.tree_flatten_with_path(params)
        self._treedef = treedef
        self._paths = [jax.tree_util.keystr(k, simple=True, separator=".") for k, _ in leaves]
        self._all = [v for _, v in leaves]
        self._idx = [i for i, p in enumerate(self._paths) if pred(p)]
        if not self._idx:
            raise ValueError("no trainable leaves matched the predicate")

    @property
    def paths(self) -> List[str]:
        return [self._paths[i] for i in self._idx]

    def extract(self, params: Any) -> List[Array]:
        leaves = jax.tree_util.tree_leaves(params)
        return [leaves[i] for i in self._idx]

    def values(self) -> List[Array]:
        return [self._all[i] for i in self._idx]

    def inject(self, trainable: List[Array], params: Optional[Any] = None) -> Any:
        leaves = (
            list(jax.tree_util.tree_leaves(params)) if params is not None else list(self._all)
        )
        for i, v in zip(self._idx, trainable):
            leaves[i] = v
        return jax.tree_util.tree_unflatten(self._treedef, leaves)


# ---------------------------------------------------------------------------
# PeftUtils — model-level adapter management (≙ ref core/peft.py:414-555)
# ---------------------------------------------------------------------------


class PeftUtils:
    @staticmethod
    def add_lora(
        params: Any,
        lora_params: dict,
        key: Optional[Array] = None,
        ignore=("lm_head",),
    ) -> Any:
        """Wrap every linear leaf in a LoRA adapter.

        lora_params: a single `lora_config(...)` dict, or {linear_tag: cfg}
        with None meaning skip (≙ `PeftUtils.add_lora`, ref :444-480).
        """
        from ..models.base import name_to_linear_tag, patch_linears

        key = key if key is not None else jax.random.PRNGKey(0)
        uniform = "r" in lora_params
        counter = [0]

        def wrap(path, layer):
            if any(ig in path for ig in ignore):
                return layer
            if isinstance(layer, LoRALinear):
                return layer
            cfg = lora_params if uniform else lora_params.get(name_to_linear_tag(path))
            if cfg is None:
                return layer
            counter[0] += 1
            sub = jax.random.fold_in(key, counter[0])
            return LoRALinear.wrap(layer, key=sub, **cfg)

        return patch_linears(params, wrap)

    @staticmethod
    def merge_lora(params: Any, quant_config: Optional[dict] = None) -> Any:
        """Merge+requantize every adapter (≙ ref `core/peft.py:482-500`)."""
        from ..models.base import patch_linears

        def merge(path, layer):
            if isinstance(layer, LoRALinear):
                return layer.merge_and_quantize(quant_config)
            return layer

        # patch_linears only visits Linear/QuantLinear; walk LoRA explicitly
        def visit(tree, path=""):
            if isinstance(tree, dict):
                return {k: visit(v, f"{path}.{k}") for k, v in tree.items()}
            if isinstance(tree, list):
                return [visit(v, f"{path}.{i}") for i, v in enumerate(tree)]
            if isinstance(tree, LoRALinear):
                return tree.merge_and_quantize(quant_config)
            return tree

        return visit(params)

    @staticmethod
    def save_lora_weights(params: Any, path: str) -> None:
        """Save only adapter weights keyed by module path
        (≙ ref `core/peft.py:502-527`, but safetensors instead of pickle)."""
        from safetensors.numpy import save_file

        flat = {}

        def visit(tree, p=""):
            if isinstance(tree, dict):
                for k, v in tree.items():
                    visit(v, f"{p}.{k}" if p else k)
            elif isinstance(tree, list):
                for i, v in enumerate(tree):
                    visit(v, f"{p}.{i}" if p else str(i))
            elif isinstance(tree, LoRALinear):
                flat[f"{p}.lora_a"] = np.asarray(tree.lora_a)
                flat[f"{p}.lora_b"] = np.asarray(tree.lora_b)
                if tree.bias is not None:
                    flat[f"{p}.lora_bias"] = np.asarray(tree.bias)

        visit(params)
        save_file(flat, path)

    @staticmethod
    def load_lora_weights(params: Any, path: str) -> Any:
        from safetensors.numpy import load_file

        flat = load_file(path)

        def visit(tree, p=""):
            if isinstance(tree, dict):
                return {k: visit(v, f"{p}.{k}" if p else k) for k, v in tree.items()}
            if isinstance(tree, list):
                return [visit(v, f"{p}.{i}" if p else str(i)) for i, v in enumerate(tree)]
            if isinstance(tree, LoRALinear):
                return dataclasses.replace(
                    tree,
                    lora_a=jnp.asarray(flat[f"{p}.lora_a"]),
                    lora_b=jnp.asarray(flat[f"{p}.lora_b"]),
                    bias=(
                        jnp.asarray(flat[f"{p}.lora_bias"])
                        if f"{p}.lora_bias" in flat
                        else tree.bias
                    ),
                )
            return tree

        return visit(params)

    @staticmethod
    def load_hf_adapter(params: Any, adapter_dir: str) -> Any:
        """Load a HuggingFace-PEFT LoRA adapter directory
        (`adapter_config.json` + `adapter_model.safetensors`) onto a quantized
        param tree (≙ `load_peft_adapter`, ref `utils/patching.py:261-288`).

        HF keys look like
        ``base_model.model.model.layers.0.self_attn.q_proj.lora_A.weight``
        with lora_A [r, in] / lora_B [out, r]; our LoRALinear stores
        lora_a [in, r] / lora_b [r, out] (transposed)."""
        import json as _json
        import os as _os

        from safetensors.numpy import load_file

        from ..models.base import patch_linears

        with open(_os.path.join(adapter_dir, "adapter_config.json")) as f:
            acfg = _json.load(f)
        r = int(acfg["r"])
        alpha = float(acfg.get("lora_alpha", r))
        tensors = load_file(_os.path.join(adapter_dir, "adapter_model.safetensors"))

        # index adapter pairs by the normalized module path suffix
        pairs: dict = {}
        for key, val in tensors.items():
            base, leaf = key.rsplit(".", 2)[0], key.rsplit(".", 2)[1]
            norm = base
            for prefix in ("base_model.model.model.", "base_model.model.", "model."):
                if norm.startswith(prefix):
                    norm = norm[len(prefix):]
                    break
            pairs.setdefault(norm, {})[leaf] = val

        def wrap(path, layer):
            if path in pairs or path.lstrip(".") in pairs:
                t = pairs.get(path, pairs.get(path.lstrip(".")))
                if "lora_A" not in t or "lora_B" not in t:
                    return layer
                lora_a = jnp.asarray(t["lora_A"]).T  # [in, r]
                lora_b = jnp.asarray(t["lora_B"]).T  # [r, out]
                base = layer.base if isinstance(layer, LoRALinear) else layer
                return LoRALinear(
                    base=base,
                    lora_a=lora_a,
                    lora_b=lora_b,
                    bias=None,
                    scaling=alpha / r,
                    dropout=0.0,
                )
            return layer

        return patch_linears(params, wrap)

    @staticmethod
    def cast_lora_weights(params: Any, dtype) -> Any:
        """≙ ref `core/peft.py:529-543`."""

        def visit(tree):
            if isinstance(tree, dict):
                return {k: visit(v) for k, v in tree.items()}
            if isinstance(tree, list):
                return [visit(v) for v in tree]
            if isinstance(tree, LoRALinear):
                return dataclasses.replace(
                    tree,
                    lora_a=tree.lora_a.astype(dtype),
                    lora_b=tree.lora_b.astype(dtype),
                    bias=None if tree.bias is None else tree.bias.astype(dtype),
                )
            return tree

        return visit(params)
