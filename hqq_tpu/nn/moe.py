# SPDX-License-Identifier: Apache-2.0
"""Mixture-of-Experts layers: stacked (grouped) expert weights, quantized.

≙ the reference's two MoE paths — Mixtral expert loops
(`/root/reference/hqq/models/hf/mixtral.py:63-83`) and the grouped-GEMM Aria
kernel (`/root/reference/hqq/utils/aria.py:19-176`) — redesigned TPU-first:

* Expert weights are STACKED along a leading E axis (`GroupedLinear` /
  `GroupedQuantLinear`), so the expert matmul is ONE batched einsum on the
  MXU (vmapped fused dequant) rather than a Python loop over experts, and the
  E axis is the natural expert-parallel sharding axis.
* Token routing uses GShard-style capacity dispatch: one-hot dispatch/combine
  einsums with a static capacity, giving fully static shapes under jit
  (the reference's cumsum-offset token grouping is a dynamic-shape idea that
  XLA cannot tile). With `capacity_factor` high enough no token is dropped —
  the setting used for parity tests.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct
from jax import Array

from ..core.quantize import QTensor, quantize as _quantize, unpack_codes
from .linear import Linear, QuantLinear

__all__ = ["GroupedLinear", "GroupedQuantLinear", "quantize_grouped", "moe_dispatch"]


@struct.dataclass
class GroupedLinear:
    """Stacked dense expert weights [E, out, in]."""

    weight: Array
    bias: Optional[Array] = None  # [E, out]

    @property
    def n_experts(self) -> int:
        return self.weight.shape[0]

    @property
    def in_features(self) -> int:
        return self.weight.shape[2]

    @property
    def out_features(self) -> int:
        return self.weight.shape[1]

    def __call__(self, x: Array) -> Array:
        """x: [E, C, in] -> [E, C, out] (batched expert matmul)."""
        out = jnp.einsum(
            "ecd,efd->ecf", x, self.weight.astype(x.dtype),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
        if self.bias is not None:
            out = out + self.bias[:, None, :].astype(out.dtype)
        return out


@struct.dataclass
class GroupedQuantLinear:
    """Stacked quantized expert weights: QTensor arrays with a leading E dim.

    ≙ `HQQGroupedGemm` (ref `utils/aria.py:19-176`), which stacks per-expert
    torchao-int4 packs; here the canonical HQQ containers stack directly and
    dequantization is vmapped over E (XLA batches the unpack+matmul).
    """

    wq: Array  # [E, packed_rows, g]
    scale: Array  # [E, NG, 1]
    zero: Array
    nbits: float = struct.field(pytree_node=False, default=4)
    group_size: Optional[int] = struct.field(pytree_node=False, default=64)
    axis: int = struct.field(pytree_node=False, default=1)
    shape: tuple = struct.field(pytree_node=False, default=())  # per-expert (out, in)
    packing: Optional[str] = struct.field(pytree_node=False, default="4bit_u8")
    compute_dtype: Any = struct.field(pytree_node=False, default=jnp.bfloat16)

    @property
    def n_experts(self) -> int:
        return self.wq.shape[0]

    @property
    def in_features(self) -> int:
        return self.shape[1]

    @property
    def out_features(self) -> int:
        return self.shape[0]

    def _qt(self, e_wq, e_scale, e_zero) -> QTensor:
        return QTensor(
            wq=e_wq, scale=e_scale, zero=e_zero, nbits=self.nbits,
            group_size=self.group_size, axis=self.axis, shape=self.shape,
            packing=self.packing, compute_dtype=self.compute_dtype,
        )

    def dequantize(self, dtype=None) -> Array:
        """-> [E, out, in]."""
        from ..core.quantize import dequantize as _dq

        return jax.vmap(
            lambda w, s, z: _dq(self._qt(w, s, z), dtype or self.compute_dtype)
        )(self.wq, self.scale, self.zero)

    def __call__(self, x: Array) -> Array:
        """x: [E, C, in] -> [E, C, out]; per-expert fused dequant+matmul."""
        w = self.dequantize(x.dtype)  # [E, out, in]
        return jnp.einsum(
            "ecd,efd->ecf", x, w, preferred_element_type=jnp.float32
        ).astype(x.dtype)


def quantize_grouped(
    weights: Array,
    nbits: float = 4,
    group_size: int = 64,
    axis: int = 1,
    round_zero: Optional[bool] = None,
    compute_dtype=jnp.bfloat16,
) -> GroupedQuantLinear:
    """Quantize stacked expert weights [E, out, in] in one vmapped solve —
    all experts optimize simultaneously on device."""
    round_zero = (nbits == 4) if round_zero is None else round_zero

    def one(w):
        qt = _quantize(
            w, nbits=nbits, group_size=group_size, axis=axis,
            round_zero=round_zero, compute_dtype=compute_dtype,
        )
        return qt.wq, qt.scale, qt.zero

    # host loop builds the stack (each call is the cached jitted quantizer);
    # shapes are identical so compilation happens once.
    parts = [one(weights[e]) for e in range(weights.shape[0])]
    wq = jnp.stack([p[0] for p in parts])
    scale = jnp.stack([p[1] for p in parts])
    zero = jnp.stack([p[2] for p in parts])
    qt0 = _quantize(
        weights[0], nbits=nbits, group_size=group_size, axis=axis,
        round_zero=round_zero, compute_dtype=compute_dtype,
    )
    return GroupedQuantLinear(
        wq=wq, scale=scale, zero=zero, nbits=qt0.nbits, group_size=qt0.group_size,
        axis=qt0.axis, shape=qt0.shape, packing=qt0.packing,
        compute_dtype=compute_dtype,
    )


def moe_dispatch(
    router_probs: Array, top_k: int, capacity: int
) -> Tuple[Array, Array]:
    """GShard-style dispatch/combine tensors from router probabilities.

    router_probs: [T, E] (already softmaxed). Returns
      dispatch [T, E, C] bool — token t occupies slot c of expert e
      combine  [T, E, C] f32  — routing weight at that slot
    Top-k selection with per-expert position assignment via cumsum; tokens
    beyond `capacity` are dropped (use capacity >= T*top_k/E * factor).
    """
    t, e = router_probs.shape
    vals, idxs = jax.lax.top_k(router_probs, top_k)  # [T, K]
    # renormalize the kept weights (HF Mixtral convention)
    vals = vals / jnp.maximum(vals.sum(-1, keepdims=True), 1e-9)

    # Queue position of every (token, k) assignment in its expert's queue:
    # flatten in token-major order and cumsum per expert.
    flat_e = idxs.reshape(t * top_k)  # [TK]
    a = jax.nn.one_hot(flat_e, e, dtype=jnp.int32)  # [TK, E]
    pos_flat = (jnp.cumsum(a, axis=0) - 1) * a  # position where assigned
    pos = pos_flat.sum(-1).reshape(t, top_k)  # [T, K]
    keep = pos < capacity

    dispatch = jnp.zeros((t, e, capacity), bool)
    combine = jnp.zeros((t, e, capacity), jnp.float32)
    for k in range(top_k):
        e_oh = jax.nn.one_hot(idxs[:, k], e, dtype=bool)  # [T, E]
        c_oh = jax.nn.one_hot(jnp.clip(pos[:, k], 0, capacity - 1), capacity, dtype=bool)
        d_k = e_oh[:, :, None] & c_oh[:, None, :] & keep[:, k][:, None, None]
        dispatch = dispatch | d_k
        combine = combine + d_k.astype(jnp.float32) * vals[:, k][:, None, None]
    return dispatch, combine
