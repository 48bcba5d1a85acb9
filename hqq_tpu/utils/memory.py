# SPDX-License-Identifier: Apache-2.0
"""Per-chip HBM footprint arithmetic for w4a8 serving under tensor parallelism.

The reference's headline claim is quantizing/serving "the largest models"
(`/root/reference/Readme.md:7`); BASELINE's scale-out line is Llama-2-70B
4-bit tensor-sharded with continuous batching on v5e (16 GB HBM/chip). This
module makes the fit a checkable number instead of a hope: it mirrors the
EXACT storage policies of the deployed serving path —

* `to_kernel_layout(pad_k_groups=_a8_pad_k_groups(qt))` padding
  (`ops/fused_matmul.py`): K to the deepest {32,16,8}-group tier with ≤5%
  waste, N to 128 lanes; codes at container_bits/8 bytes per padded weight;
  scale+zs at `meta_bytes` each per (K_pad/g, N_pad) entry,
* TP sharding from `parallel/tp.py`: COL projections shard N, ROW shard K,
  embeddings replicated, lm_head column-sharded over vocab,
* the paged engine's pool `[L, kv_heads/tp, num_pages, page_size, hd]` ×2
  (K and V), plus per-token fp32 scales when `kv_dtype` is int8
  (`serving/paged.py` PagedCache layout).

`tests/test_memory_fit.py` asserts the 70B-on-8×v5e arithmetic;
`docs/SERVING.md` quotes the same numbers.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional


V5E_HBM_BYTES = 16 * 1024**3  # 16 GiB per v5e chip


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _pad_k_groups(k: int, g: int) -> int:
    """Mirror of `backends.pallas_backend._a8_pad_k_groups`: deepest
    class-replication tier whose zero-padding stays ≤5% of K."""
    for tier in (32, 16):
        pad = _round_up(k, tier * g)
        if (pad - k) * 20 <= k:
            return tier
    return 8


def kernel_layout_bytes(
    n: int, k: int, *, nbits: int = 4, group_size: int = 64, meta_bytes: int = 4
) -> int:
    """Storage bytes of one w4a8 kernel-layout projection [n, k] (axis=1),
    including the padding `to_kernel_layout` actually applies."""
    g = group_size
    container_bits = {8: 8, 4: 4, 3: 4, 2: 2, 1: 1}[nbits]
    tier = _pad_k_groups(k, g)
    k_pad = _round_up(k, tier * g) if k > 8 * g else k
    n_pad = _round_up(n, 128)
    codes = k_pad * n_pad * container_bits // 8
    meta = 2 * (k_pad // g) * n_pad * meta_bytes  # scale + zs
    return codes + meta


@dataclasses.dataclass
class FootprintReport:
    per_chip_weights: int
    per_chip_embed_head: int
    per_chip_kv_pool: int
    per_chip_total: int
    hbm_bytes: int

    @property
    def fits(self) -> bool:
        return self.per_chip_total <= self.hbm_bytes

    @property
    def utilization(self) -> float:
        return self.per_chip_total / self.hbm_bytes

    def __str__(self) -> str:  # pragma: no cover - formatting
        gb = 1024**3
        return (
            f"weights {self.per_chip_weights / gb:.2f} GiB + "
            f"embed/head {self.per_chip_embed_head / gb:.2f} GiB + "
            f"KV pool {self.per_chip_kv_pool / gb:.2f} GiB = "
            f"{self.per_chip_total / gb:.2f} / {self.hbm_bytes / gb:.0f} GiB "
            f"({self.utilization * 100:.0f}%)"
        )


def w4a8_tp_footprint(
    cfg: Any,
    *,
    tp: int = 1,
    nbits: int = 4,
    group_size: int = 64,
    meta_bytes: int = 4,
    compute_bytes: int = 2,
    num_pages: int = 0,
    page_size: int = 16,
    kv_dtype_bytes: int = 2,
    kv_int8: bool = False,
    fused: bool = True,
    hbm_bytes: int = V5E_HBM_BYTES,
) -> FootprintReport:
    """Per-chip HBM bytes of a Llama-family model served w4a8 under TP.

    `cfg` is any config with hidden_size / intermediate_size /
    num_hidden_layers / num_attention_heads / num_key_value_heads /
    head_dim_ / vocab_size. `fused` mirrors `fuse_for_decode` (one qkv and
    one gate_up projection per block). `num_pages` is the PER-CHIP paged
    pool; kv_int8 adds the fp32 per-token scale planes the int8-KV cache
    carries."""
    d = cfg.hidden_size
    f = cfg.intermediate_size
    L = cfg.num_hidden_layers
    nh, nkv, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim_
    assert nh % tp == 0 and nkv % tp == 0, "head counts must divide tp"

    def col(n, k):  # column-parallel: shard N
        return kernel_layout_bytes(n // tp, k, nbits=nbits,
                                   group_size=group_size, meta_bytes=meta_bytes)

    def row(n, k):  # row-parallel: shard K
        return kernel_layout_bytes(n, k // tp, nbits=nbits,
                                   group_size=group_size, meta_bytes=meta_bytes)

    if fused:
        attn = col((nh + 2 * nkv) * hd, d) + row(d, nh * hd)
        mlp = col(2 * f, d) + row(d, f)
    else:
        attn = col(nh * hd, d) + 2 * col(nkv * hd, d) + row(d, nh * hd)
        mlp = 2 * col(f, d) + row(d, f)
    norms = 2 * d * compute_bytes
    weights = L * (attn + mlp + norms) + d * compute_bytes  # + final norm

    # embeddings replicated; lm_head column-sharded over vocab (parallel/tp.py)
    embed_head = cfg.vocab_size * d * compute_bytes * (1 + 1 / tp)

    kv = 2 * L * (nkv // tp) * num_pages * page_size * hd * kv_dtype_bytes
    if kv_int8:
        kv += 2 * L * (nkv // tp) * num_pages * page_size * 4  # fp32 scales

    total = weights + int(embed_head) + kv
    return FootprintReport(
        per_chip_weights=weights,
        per_chip_embed_head=int(embed_head),
        per_chip_kv_pool=kv,
        per_chip_total=total,
        hbm_bytes=hbm_bytes,
    )
