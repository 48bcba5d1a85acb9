# SPDX-License-Identifier: Apache-2.0
"""Per-chip HBM fit arithmetic for the BASELINE scale-out target.

BASELINE.md names "Llama-2-70B 4-bit tensor-sharded, continuous batching" on
multi-host v5e (16 GB HBM/chip). These tests pin the arithmetic the serving
path actually produces (`utils/memory.py` mirrors `to_kernel_layout` padding,
`parallel/tp.py` sharding, and `ops/paged.py` pool shapes), and cross-check
the formula against REAL array sizes from a quantize+layout round trip."""

import jax.numpy as jnp
import numpy as np
import pytest

from hqq_tpu.utils.memory import (
    V5E_HBM_BYTES,
    kernel_layout_bytes,
    w4a8_tp_footprint,
)


class Llama70BCfg:
    vocab_size = 32000
    hidden_size = 8192
    intermediate_size = 28672
    num_hidden_layers = 80
    num_attention_heads = 64
    num_key_value_heads = 8
    head_dim_ = 128


def test_kernel_layout_bytes_matches_real_arrays():
    """The analytic formula must equal the actual bytes `to_kernel_layout`
    allocates (same padding policy as the deployed w4a8 backend)."""
    from hqq_tpu.backends.pallas_backend import _a8_pad_k_groups
    from hqq_tpu.core.quantize import quantize
    from hqq_tpu.ops.fused_matmul import to_kernel_layout

    rng = np.random.default_rng(0)
    # 70B projection shapes (TP=8 shards) + a 7B shape with ragged K padding
    for (n, k) in ((1280, 8192), (8192, 1024), (7168, 8192), (8192, 3584),
                   (4096, 11008)):
        w = jnp.asarray(rng.standard_normal((n, k), dtype=np.float32) / 20)
        qt = quantize(w, nbits=4, group_size=64, axis=1, round_zero=True,
                      compute_dtype=jnp.bfloat16)
        kqt = to_kernel_layout(qt, pad_k_groups=_a8_pad_k_groups(qt))
        real = (kqt.wq.size * kqt.wq.dtype.itemsize
                + (kqt.scale.size + kqt.zs.size) * kqt.scale.dtype.itemsize)
        assert kernel_layout_bytes(n, k) == real, (n, k)


def test_llama70b_w4a8_fits_8x_v5e():
    """70B w4a8 + a 32k-token int8-KV page pool per chip must fit 16 GB with
    headroom for activations/executables (≤ 60% utilization)."""
    rep = w4a8_tp_footprint(
        Llama70BCfg, tp=8, num_pages=2048, page_size=16,
        kv_dtype_bytes=1, kv_int8=True,
    )
    assert rep.fits, str(rep)
    assert rep.utilization <= 0.60, str(rep)
    # the weights term alone must beat bf16 by ~4x: bf16 70B / 8 chips
    bf16_per_chip = 2 * 70e9 / 8
    assert rep.per_chip_weights < 0.35 * bf16_per_chip


def test_llama70b_bf16_does_not_fit():
    """Contrast: unquantized bf16 70B does NOT fit 8x v5e — the w4a8 path is
    what makes the BASELINE geometry servable at all."""
    c = Llama70BCfg
    linear = c.num_hidden_layers * (
        c.hidden_size * (c.num_attention_heads + 2 * c.num_key_value_heads) * c.head_dim_
        + c.num_attention_heads * c.head_dim_ * c.hidden_size
        + 3 * c.hidden_size * c.intermediate_size
    )
    bf16_total = 2 * (linear + 2 * c.vocab_size * c.hidden_size)
    assert bf16_total / 8 > V5E_HBM_BYTES


def test_llama70b_w4a8_fits_4x_v5e_tight():
    """The stronger claim: 70B w4a8 fits FOUR v5e chips (tp=4) with a
    16k-token int8-KV pool — half the chips the bf16 model can't even run on
    at tp=8."""
    rep = w4a8_tp_footprint(
        Llama70BCfg, tp=4, num_pages=1024, page_size=16,
        kv_dtype_bytes=1, kv_int8=True,
    )
    assert rep.fits, str(rep)


@pytest.mark.parametrize("tp", [1, 2])
def test_footprint_monotonic_in_tp(tp):
    rep1 = w4a8_tp_footprint(Llama70BCfg, tp=tp, num_pages=256)
    rep2 = w4a8_tp_footprint(Llama70BCfg, tp=tp * 2, num_pages=256)
    assert rep2.per_chip_weights < rep1.per_chip_weights
    assert rep2.per_chip_kv_pool <= rep1.per_chip_kv_pool
