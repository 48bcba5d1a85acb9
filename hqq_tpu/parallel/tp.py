# SPDX-License-Identifier: Apache-2.0
"""Tensor-parallel serving path: shard_map + kernel-layout weights.

This is the TPU-native replacement for the reference's vLLM TP integration
(`/root/reference/hqq/utils/vllm.py:111-170`): where the reference unpacks and
repacks HQQ weights so vLLM's NCCL ranks can row/column-shard them, here the
kernel-layout weights shard *natively* — `KernelQTensor` stores W^T [K//r, N]
with scale/zs [K//g, N], so

    column-parallel (q/k/v/gate/up): shard N  -> P(None, "model")
    row-parallel    (o/down):        shard K  -> P("model", None) + psum

and the fused Pallas dequant+matmul kernel runs unchanged on each local
shard inside `shard_map`. Activations follow the Megatron dataflow: the
residual stream is replicated over "model", attention heads / MLP hidden are
sharded, one psum per attention block and one per MLP. Batch shards over
"data". One all-gather recovers full-vocab logits from the column-parallel
head.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct
from jax import Array
from jax.sharding import Mesh, PartitionSpec as P

from ..backends.pallas_backend import PallasQuantLinear
from ..models import llama
from ..models.llama import KVCache, LlamaConfig
from ..nn.linear import Linear, QuantLinear
from ..ops.fused_matmul import supports_kernel_layout, to_kernel_layout

try:  # jax >= 0.7 exposes shard_map at top level
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map  # type: ignore

__all__ = [
    "RowParallelLinear",
    "AllGatherLinear",
    "prepare_tp_llama",
    "tp_forward_fn",
    "tp_paged_forward_fn",
    "tp_serving_forward_fn",
]


@struct.dataclass
class RowParallelLinear:
    """Row-parallel wrapper: local matmul over the K-shard, psum over the
    model axis, bias added once after the reduction."""

    inner: Any
    bias: Optional[Array] = None
    axis_name: str = struct.field(pytree_node=False, default="model")

    @property
    def in_features(self):
        return self.inner.in_features

    @property
    def out_features(self):
        return self.inner.out_features

    def __call__(self, x: Array) -> Array:
        y = jax.lax.psum(self.inner(x), self.axis_name)
        if self.bias is not None:
            y = y + self.bias.astype(y.dtype)
        return y


@struct.dataclass
class AllGatherLinear:
    """Column-parallel head whose sharded outputs are gathered on the last
    axis (used for lm_head so sampling sees full-vocab logits)."""

    inner: Any
    axis_name: str = struct.field(pytree_node=False, default="model")

    def __call__(self, x: Array) -> Array:
        y = self.inner(x)
        return jax.lax.all_gather(y, self.axis_name, axis=y.ndim - 1, tiled=True)


def _kernel_tp_ok(qt) -> bool:
    """Kernel layout is TP-shardable only when conversion adds NO padding:
    padded N columns / K rows would be split across ranks as if real."""
    n_out, k = qt.shape
    if n_out % 128:
        return False
    g = qt.group_size
    return k <= 8 * g or k % (8 * g) == 0


def _to_fast(layer: Any, use_pallas: bool, backend: str = "pallas") -> Any:
    """QuantLinear -> a TP-shardable form.

    Preferred: a kernel-layout module (`pallas` bf16-operand or `w4a8`
    int8-operand — both store W^T [K//r, N] which shards cleanly along N/K).
    Fallback: DENSE Linear from the dequantized weight — a replicated
    QuantLinear cannot sit in a column/row-parallel position (its output
    would stay global-sized while the rest of the layer runs on local
    shards), and a kernel layout that PADS N or K would shard its padding
    as real columns/rows."""
    if isinstance(layer, QuantLinear):
        if use_pallas and supports_kernel_layout(layer.qweight) and _kernel_tp_ok(
            layer.qweight
        ):
            if backend == "w4a8":
                from ..backends.pallas_backend import A8QuantLinear

                # keep the minimum K padding: shard-local K must stay a
                # multiple of the tile unit on every rank
                return A8QuantLinear(
                    kqt=to_kernel_layout(layer.qweight), bias=layer.bias
                )
            return PallasQuantLinear(kqt=to_kernel_layout(layer.qweight), bias=layer.bias)
        return Linear(weight=layer.dequantize(), bias=layer.bias)
    return layer


def _strip_bias(layer: Any) -> Tuple[Any, Optional[Array]]:
    bias = getattr(layer, "bias", None)
    if bias is not None:
        layer = dataclasses.replace(layer, bias=None)
    return layer, bias


def _layer_spec(layer: Any, mode: str):
    """PartitionSpec pytree for one (possibly wrapped) linear layer."""
    from ..backends.pallas_backend import A8QuantLinear

    if isinstance(layer, RowParallelLinear):
        return dataclasses.replace(
            layer,
            inner=_layer_spec(layer.inner, "row"),
            bias=None if layer.bias is None else P(),
        )
    if isinstance(layer, AllGatherLinear):
        return dataclasses.replace(layer, inner=_layer_spec(layer.inner, "col"))
    if isinstance(layer, (PallasQuantLinear, A8QuantLinear)):
        if mode == "col":
            kspec = dataclasses.replace(
                layer.kqt, wq=P(None, "model"), scale=P(None, "model"), zs=P(None, "model")
            )
            bspec = P("model")
        else:
            kspec = dataclasses.replace(
                layer.kqt, wq=P("model", None), scale=P("model", None), zs=P("model", None)
            )
            bspec = P()
        return dataclasses.replace(
            layer, kqt=kspec, bias=None if layer.bias is None else bspec
        )
    if isinstance(layer, Linear):
        wspec = P("model", None) if mode == "col" else P(None, "model")
        bspec = P("model") if mode == "col" else P()
        return dataclasses.replace(
            layer, weight=wspec, bias=None if layer.bias is None else bspec
        )
    raise TypeError(f"unsupported layer {type(layer)}")


def prepare_tp_llama(
    params: dict, cfg: LlamaConfig, mesh: Mesh, use_pallas: bool = True,
    backend: str = "pallas",
) -> Tuple[dict, Any, LlamaConfig]:
    """Build (tp_params, tp_param_specs, local_cfg) for `tp_forward_fn`.

    tp_params hold GLOBAL arrays; shard_map hands each device its local
    shard according to the specs. `local_cfg` has per-device head counts so
    `llama.forward` runs unmodified on the local shards.
    """
    tp = mesh.shape["model"]
    assert cfg.num_attention_heads % tp == 0, "heads must divide model axis"
    assert cfg.num_key_value_heads % tp == 0, "kv heads must divide model axis"

    def conv_layer(layer_d: dict) -> dict:
        sa, mlp = layer_d["self_attn"], layer_d["mlp"]
        o_proj, o_bias = _strip_bias(_to_fast(sa["o_proj"], use_pallas, backend))
        down, down_bias = _strip_bias(_to_fast(mlp["down_proj"], use_pallas, backend))
        return {
            "self_attn": {
                "q_proj": _to_fast(sa["q_proj"], use_pallas, backend),
                "k_proj": _to_fast(sa["k_proj"], use_pallas, backend),
                "v_proj": _to_fast(sa["v_proj"], use_pallas, backend),
                "o_proj": RowParallelLinear(inner=o_proj, bias=o_bias),
            },
            "mlp": {
                "gate_proj": _to_fast(mlp["gate_proj"], use_pallas, backend),
                "up_proj": _to_fast(mlp["up_proj"], use_pallas, backend),
                "down_proj": RowParallelLinear(inner=down, bias=down_bias),
            },
            "input_layernorm": layer_d["input_layernorm"],
            "post_attention_layernorm": layer_d["post_attention_layernorm"],
        }

    tp_params = {
        "embed_tokens": params["embed_tokens"],
        "layers": [conv_layer(ld) for ld in params["layers"]],
        "norm": params["norm"],
    }
    if "lm_head" in params:
        tp_params["lm_head"] = AllGatherLinear(
            inner=_to_fast(params["lm_head"], use_pallas, backend)
        )

    def spec_layer(layer_d: dict) -> dict:
        sa, mlp = layer_d["self_attn"], layer_d["mlp"]
        return {
            "self_attn": {
                "q_proj": _layer_spec(sa["q_proj"], "col"),
                "k_proj": _layer_spec(sa["k_proj"], "col"),
                "v_proj": _layer_spec(sa["v_proj"], "col"),
                "o_proj": _layer_spec(sa["o_proj"], "row"),
            },
            "mlp": {
                "gate_proj": _layer_spec(mlp["gate_proj"], "col"),
                "up_proj": _layer_spec(mlp["up_proj"], "col"),
                "down_proj": _layer_spec(mlp["down_proj"], "row"),
            },
            "input_layernorm": P(),
            "post_attention_layernorm": P(),
        }

    tp_specs = {
        "embed_tokens": P(),
        "layers": [spec_layer(ld) for ld in tp_params["layers"]],
        "norm": P(),
    }
    if "lm_head" in tp_params:
        tp_specs["lm_head"] = _layer_spec(tp_params["lm_head"], "col")

    local_cfg = dataclasses.replace(
        cfg,
        num_attention_heads=cfg.num_attention_heads // tp,
        num_key_value_heads=cfg.num_key_value_heads // tp,
        head_dim=cfg.head_dim_,
    )
    return tp_params, tp_specs, local_cfg


def tp_forward_fn(mesh: Mesh, tp_specs: Any, local_cfg: LlamaConfig):
    """Build a jitted TP forward: (tp_params, tokens, cache, start_pos) ->
    (logits, cache). Cache is GLOBAL with [L, B, heads, S, hd] sharded as
    (None, "data", "model", None, None)."""
    cache_spec = KVCache(
        k=P(None, "data", "model", None, None),
        v=P(None, "data", "model", None, None),
    )

    def body(params, tokens, cache, start_pos):
        return llama.forward(params, local_cfg, tokens, cache, start_pos)

    try:
        fwd = shard_map(
            body,
            mesh=mesh,
            in_specs=(tp_specs, P("data", None), cache_spec, P()),
            out_specs=(P("data", None, None), cache_spec),
            check_vma=False,
        )
    except TypeError:  # older shard_map API
        fwd = shard_map(
            body,
            mesh=mesh,
            in_specs=(tp_specs, P("data", None), cache_spec, P()),
            out_specs=(P("data", None, None), cache_spec),
            check_rep=False,
        )
    return jax.jit(fwd)


def _shard_map(body, mesh, in_specs, out_specs):
    try:
        return shard_map(body, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                         check_vma=False)
    except TypeError:  # older shard_map API
        return shard_map(body, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                         check_rep=False)


def tp_paged_forward_fn(mesh: Mesh, tp_specs: Any, local_cfg: LlamaConfig,
                        quantize_kv: bool = False, page_size: int = 16):
    """Jitted TP *paged* decode step: (tp_params, tokens [B,1], paged_cache,
    lengths [B], page_indices [B,MP]) -> (logits, cache).

    The page pool shards its KV-head axis over "model" —
    [L, H/tp, P, pg, hd] per device — so page reads/writes and the paged
    attention stay device-local; the only collectives are the Megatron psums
    inside the layer (RowParallelLinear) and the lm_head all-gather. Batch
    (decode slots) stays host-side, as in the single-chip engine.

    ≙ what the reference gets from vLLM's TP workers
    (`/root/reference/hqq/utils/vllm.py:111-170`), expressed as ONE SPMD
    program instead of an NCCL process group."""
    from ..ops.paged import PagedKVCache

    pool = P(None, "model", None, None, None)
    meta = pool if quantize_kv else None
    # page_size is a static pytree field: the spec must carry the SAME value
    # as the runtime cache or the treedefs mismatch inside shard_map
    cache_spec = PagedKVCache(
        k=pool, v=pool, k_scales=meta, v_scales=meta, page_size=page_size
    )

    def body(params, tokens, cache, lengths, page_indices):
        return llama.forward(
            params, local_cfg, tokens, cache, lengths, page_indices=page_indices
        )

    fwd = _shard_map(
        body,
        mesh,
        in_specs=(tp_specs, P(), cache_spec, P(), P()),
        out_specs=(P(), cache_spec),
    )
    return jax.jit(fwd)


def tp_serving_forward_fn(mesh: Mesh, tp_specs: Any, local_cfg: LlamaConfig,
                          quantize_kv: bool = False, page_size: int = 16):
    """Combined injection point for the serving engines: dispatches a dense
    cache (prefill / dense decode slots) to `tp_forward_fn` and a
    `PagedKVCache` to `tp_paged_forward_fn`. Matches the engines'
    `forward_fn(params, tokens, cache, start_pos[, page_indices])` contract.
    Use a data=1 mesh: engine batch slots stay host-side."""
    from ..ops.paged import PagedKVCache

    dense = tp_forward_fn(mesh, tp_specs, local_cfg)
    paged = tp_paged_forward_fn(mesh, tp_specs, local_cfg,
                                quantize_kv=quantize_kv, page_size=page_size)

    def fwd(params, tokens, cache, start_pos, page_indices=None):
        if isinstance(cache, PagedKVCache):
            return paged(params, tokens, cache, start_pos, page_indices)
        return dense(params, tokens, cache, start_pos)

    return fwd
