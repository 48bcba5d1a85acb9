# SPDX-License-Identifier: Apache-2.0
"""Multi-LoRA serving: MANY adapters stacked over ONE quantized base, with
per-request adapter selection inside a single batched forward (the
LoRAX/vLLM multi-adapter idea, absent from the reference — it serves one
merged adapter at a time).

`MultiLoRALinear` holds `a_stack [n_adapters, in, r]` / `b_stack
[n_adapters, r, out]`; the active adapter id per BATCH ROW comes from an
`adapter_context` — a trace-time binding installed around the jitted
forward, so unmodified model code (layers are called as `layer(x)`) picks
it up. Adapter id 0 is conventionally the empty adapter (zero B).
"""

from __future__ import annotations

import contextlib
from typing import Any, List, Optional

import jax.numpy as jnp
from flax import struct
from jax import Array

__all__ = ["MultiLoRALinear", "adapter_context", "stack_adapters"]

# Trace-time binding of the per-row adapter ids ([B] int32). Safe under jit:
# tracing is synchronous, and the ids tracer is captured while the context is
# active (the same pattern flax uses for RNG/state plumbing).
_ADAPTER_IDS: List[Optional[Array]] = [None]


@contextlib.contextmanager
def adapter_context(ids: Array):
    """Bind per-batch-row adapter ids for all MultiLoRALinear layers reached
    while tracing/executing the enclosed call."""
    _ADAPTER_IDS.append(jnp.asarray(ids, jnp.int32))
    try:
        yield
    finally:
        _ADAPTER_IDS.pop()


def current_adapter_ids() -> Optional[Array]:
    return _ADAPTER_IDS[-1]


@struct.dataclass
class MultiLoRALinear:
    """Quantized (or dense) base + a bank of LoRA adapters selected per row.

    out[b] = base(x[b]) + (x[b] @ A[ids[b]]) @ B[ids[b]] * scaling
    With no adapter_context bound, behaves as the bare base layer.
    """

    base: Any
    a_stack: Array  # [n_adapters, in, r]
    b_stack: Array  # [n_adapters, r, out]
    scaling: float = struct.field(pytree_node=False, default=1.0)

    @property
    def in_features(self) -> int:
        return self.base.in_features

    @property
    def out_features(self) -> int:
        return self.base.out_features

    @property
    def n_adapters(self) -> int:
        return self.a_stack.shape[0]

    def __call__(self, x: Array) -> Array:
        out = self.base(x)
        ids = current_adapter_ids()
        if ids is None:
            return out
        # x: [B, T, in] (or [B, in]); gather each row's adapter
        a = jnp.take(self.a_stack, ids, axis=0)  # [B, in, r]
        b = jnp.take(self.b_stack, ids, axis=0)  # [B, r, out]
        xf = x.astype(self.a_stack.dtype)
        if x.ndim == 2:
            delta = jnp.einsum("bd,bdr->br", xf, a)
            delta = jnp.einsum("br,bro->bo", delta, b)
        else:
            delta = jnp.einsum("btd,bdr->btr", xf, a)
            delta = jnp.einsum("btr,bro->bto", delta, b)
        return out + (delta * self.scaling).astype(out.dtype)

    def dequantize(self, dtype=None):
        return self.base.dequantize(dtype) if hasattr(self.base, "dequantize") else self.base.weight


def stack_adapters(params_list: List[Any], base_params: Any, scaling: float = 1.0):
    """Build a multi-adapter tree from N LoRA-wrapped trees sharing one base.

    params_list: list of trees whose linear leaves are `LoRALinear` wrapping
    the SAME quantized base (e.g. N fine-tunes of one checkpoint). Returns a
    tree with `MultiLoRALinear` leaves; adapter i in the stack corresponds to
    params_list[i]. Leaves that are not LoRA-wrapped are taken from
    base_params unchanged.

    `base_params` may be backend-prepared (`prepare_for_inference` having
    converted leaves to PallasQuantLinear / A8QuantLinear): the stack wraps
    whatever leaf sits at each adapter's path, so multi-LoRA serving composes
    with the fast decode kernels.
    """
    from ..core.peft import LoRALinear
    from ..models.base import _walk

    # index the adapters by path (LoRALinear leaves)
    adapter_maps = []
    for tree in params_list:
        found = {}

        def visit(path, node, _found=found):
            if isinstance(node, LoRALinear):
                _found[path] = node
            return node

        _walk(tree, "", visit)
        adapter_maps.append(found)

    def convert(path, layer):
        wraps = [m.get(path) for m in adapter_maps]
        if not all(isinstance(w, LoRALinear) for w in wraps):
            return layer
        a_stack = jnp.stack([w.lora_a for w in wraps])
        b_stack = jnp.stack([w.lora_b * w.scaling / scaling for w in wraps])
        return MultiLoRALinear(
            base=layer, a_stack=a_stack, b_stack=b_stack, scaling=scaling
        )

    return _walk(base_params, "", convert)
