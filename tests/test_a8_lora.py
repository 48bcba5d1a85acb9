# SPDX-License-Identifier: Apache-2.0
"""HQQ+ adapters fused into the w4a8 decode kernel (BASELINE config 4 on the
int8-MXU-rate path; ≙ reference gemlite backend + merged adapters,
`/root/reference/hqq/utils/patching.py:193-257`).

The base dequant-matmul stays weight-side exact (int8-operand class
replication); the LoRA partial x@A is computed at FULL activation precision
outside the kernel and only the rank-r @ B epilogue runs inside — so the
adapter contribution is exact to f32 rounding, independent of the int8
activation quantization of the base."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hqq_tpu.core.peft import LoRALinear, PeftUtils, lora_config
from hqq_tpu.core.quantize import BaseQuantizeConfig, dequantize, quantize
from hqq_tpu.nn.linear import QuantLinear
from hqq_tpu.ops.fused_matmul import (
    quant_matmul_pallas_a8_lora,
    quantize_activations_int8,
    to_kernel_layout,
)


def _make(n_out, k, g, nbits, r=8, pad_k_groups=8, seed=0):
    key = jax.random.PRNGKey(seed)
    w = jax.random.normal(key, (n_out, k), jnp.float32) / np.sqrt(k)
    qt = quantize(w, nbits=nbits, group_size=g, axis=1, round_zero=(nbits == 4))
    kqt = to_kernel_layout(qt, pad_k_groups=pad_k_groups)
    ka, kb = jax.random.split(jax.random.PRNGKey(seed + 1))
    a = jax.random.normal(ka, (k, r), jnp.float32) / np.sqrt(k)
    b = jax.random.normal(kb, (r, n_out), jnp.float32) * 0.05
    return w, qt, kqt, a, b


@pytest.mark.parametrize(
    "m,n_out,k,g,nbits,pad_k",
    [
        (1, 256, 2048, 64, 4, 32),   # M=1 route (k % 32g == 0)
        (1, 256, 512, 64, 4, 8),     # M=1, S=8 route
        (8, 256, 512, 64, 4, 8),     # M<=32 route
        (3, 256, 512, 64, 4, 8),     # odd M pads to 8
        (1, 256, 2048, 64, 2, 32),   # 2-bit (BASELINE config 4)
        (4, 256, 512, 64, 2, 8),
        (4, 256, 512, 64, 1, 8),     # 1-bit (BASELINE config 4)
    ],
)
def test_a8_lora_weight_side_exact(m, n_out, k, g, nbits, pad_k):
    """kernel == (x8·sx) @ W_dq^T + (x @ A) @ B to f32 rounding: the base is
    weight-side exact, the adapter is activation-exact (full-precision x@A)."""
    w, qt, kqt, a, b = _make(n_out, k, g, nbits, pad_k_groups=pad_k)
    x = jax.random.normal(jax.random.PRNGKey(1), (m, k), jnp.float32)
    w_dq = np.asarray(dequantize(qt, jnp.float32))
    x8, sx = quantize_activations_int8(x)
    expected = (np.asarray(x8, np.float32) * np.asarray(sx)) @ w_dq.T
    expected = expected + (np.asarray(x) @ np.asarray(a)) @ np.asarray(b)

    got = np.asarray(quant_matmul_pallas_a8_lora(x, kqt, a, b), np.float32)
    rel = np.abs(got - expected).max() / np.abs(expected).max()
    assert rel < 2e-5, f"a8+LoRA mismatch: rel={rel}"


def test_a8_lora_prefill_falls_back_exact():
    """M>32 routes to the bf16-operand fused LoRA kernel: full-precision
    activations, exact vs dequant matmul + adapter."""
    w, qt, kqt, a, b = _make(256, 512, 64, 4)
    x = jax.random.normal(jax.random.PRNGKey(1), (40, 512), jnp.float32)
    w_dq = np.asarray(dequantize(qt, jnp.float32))
    expected = np.asarray(x) @ w_dq.T + (np.asarray(x) @ np.asarray(a)) @ np.asarray(b)
    got = np.asarray(quant_matmul_pallas_a8_lora(x, kqt, a, b), np.float32)
    rel = np.abs(got - expected).max() / np.abs(expected).max()
    assert rel < 2e-5, rel


def test_patch_lora_to_w4a8_layer():
    """LoRALinear(QuantLinear) -> A8LoRAQuantLinear; forward within the
    activation-quant envelope of the unfused LoRA layer, and the bias +
    scaling fold correctly."""
    from hqq_tpu.backends.pallas_backend import A8LoRAQuantLinear, patch_lora_to_w4a8

    w = jax.random.normal(jax.random.PRNGKey(0), (256, 512), jnp.float32) / 22
    bias = jnp.ones((256,), jnp.float32) * 0.1
    layer = QuantLinear.quantize(
        w, bias, nbits=4, group_size=64, axis=1, round_zero=True,
        compute_dtype=jnp.float32,
    )
    lora = LoRALinear.wrap(layer, r=8, lora_alpha=16)  # scaling = 2.0
    lora = lora.replace(
        lora_b=jax.random.normal(jax.random.PRNGKey(2), lora.lora_b.shape,
                                 jnp.float32) * 0.02
    )
    fused = patch_lora_to_w4a8(lora)
    assert isinstance(fused, A8LoRAQuantLinear)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 512), jnp.float32)
    ref = np.asarray(lora(x))
    got = np.asarray(fused(x))
    rel = np.abs(got - ref).max() / np.abs(ref).max()
    assert rel < 0.03, rel
    # adapter contribution must actually be present (not silently dropped)
    base_only = np.asarray(layer(x))
    assert np.abs(ref - base_only).max() > 1e-3
    assert np.abs(got - base_only).max() > 1e-3


def test_prepare_for_inference_w4a8_converts_lora():
    """Model-level: add_lora + prepare_for_inference('w4a8') fuses every
    adapter layer into A8LoRAQuantLinear and the forward tracks the unfused
    LoRA forward."""
    from hqq_tpu.backends.pallas_backend import A8LoRAQuantLinear
    from hqq_tpu.models import llama
    from hqq_tpu.models.base import quantize_model
    from hqq_tpu.utils.patching import prepare_for_inference

    cfg = llama.LlamaConfig.tiny()
    params = llama.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    q = quantize_model(params, BaseQuantizeConfig(nbits=4, group_size=32),
                       compute_dtype=jnp.float32)
    lora = PeftUtils.add_lora(q, lora_config(r=4))

    # give the adapters signal
    import dataclasses as dc

    def bump(node):
        if isinstance(node, dict):
            return {k: bump(v) for k, v in node.items()}
        if isinstance(node, list):
            return [bump(v) for v in node]
        if isinstance(node, LoRALinear):
            b = jax.random.normal(jax.random.PRNGKey(3), node.lora_b.shape,
                                  node.lora_b.dtype) * 0.02
            return dc.replace(node, lora_b=b)
        return node

    lora = bump(lora)
    fused = prepare_for_inference(lora, "w4a8")
    assert isinstance(fused["layers"][0]["self_attn"]["q_proj"], A8LoRAQuantLinear)

    tokens = jnp.asarray([[3, 17, 29, 5]], jnp.int32)
    ref_logits, _ = llama.forward(lora, cfg, tokens)
    got_logits, _ = llama.forward(fused, cfg, tokens)
    rel = float(jnp.max(jnp.abs(got_logits - ref_logits))
                / jnp.max(jnp.abs(ref_logits)))
    assert rel < 0.05, rel


def test_multilora_engine_on_w4a8_base(rng):
    """Multi-LoRA serving over a w4a8-prepared base: per-request adapters in
    the batching engine match single-adapter runs on the same base."""
    import dataclasses as dc

    from hqq_tpu.models import LlamaConfig, forward, init_params, quantize_model
    from hqq_tpu.nn.multilora import MultiLoRALinear, adapter_context, stack_adapters
    from hqq_tpu.utils.patching import prepare_for_inference

    cfg = LlamaConfig.tiny(vocab_size=128)
    q = quantize_model(
        init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32),
        BaseQuantizeConfig(nbits=4, group_size=32), compute_dtype=jnp.float32,
    )
    base = prepare_for_inference(q, "w4a8")

    def bump(tree, value):
        def rec(node):
            if isinstance(node, dict):
                return {k: rec(v) for k, v in node.items()}
            if isinstance(node, list):
                return [rec(v) for v in node]
            if isinstance(node, LoRALinear):
                b = jnp.asarray(rng.standard_normal(node.lora_b.shape) * value,
                                node.lora_b.dtype)
                return dc.replace(node, lora_b=b)
            return node

        return rec(tree)

    # adapters are trained over the QuantLinear tree; served over the
    # prepared (fast-kernel) base
    lora0 = bump(PeftUtils.add_lora(q, lora_config(r=4)), 0.02)
    lora1 = bump(PeftUtils.add_lora(q, lora_config(r=4)), 0.05)
    multi = stack_adapters([lora0, lora1], base)

    def rebase(lora_tree, base_tree):
        """LoRALinear leaves keep a/b but take the prepared base leaf."""
        if isinstance(lora_tree, dict):
            return {k: rebase(v, base_tree[k]) for k, v in lora_tree.items()}
        if isinstance(lora_tree, list):
            return [rebase(v, base_tree[i]) for i, v in enumerate(lora_tree)]
        if isinstance(lora_tree, LoRALinear):
            return dc.replace(lora_tree, base=base_tree)
        return base_tree

    lora0 = rebase(lora0, base)
    lora1 = rebase(lora1, base)
    assert isinstance(multi["layers"][0]["self_attn"]["q_proj"], MultiLoRALinear)
    # the multi-LoRA base IS the a8 kernel layer
    from hqq_tpu.backends.pallas_backend import A8QuantLinear

    assert isinstance(multi["layers"][0]["self_attn"]["q_proj"].base, A8QuantLinear)

    tokens = jnp.asarray(rng.integers(1, 128, (2, 6)), jnp.int32)

    @jax.jit
    def multi_fwd(params, toks, ids):
        with adapter_context(ids):
            return forward(params, cfg, toks)[0]

    out = multi_fwd(multi, tokens, jnp.asarray([0, 1], jnp.int32))
    ref0, _ = forward(lora0, cfg, tokens[:1])
    ref1, _ = forward(lora1, cfg, tokens[1:])
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(ref0[0]),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(ref1[0]),
                               rtol=2e-4, atol=2e-4)
    assert np.abs(np.asarray(out[0]) - np.asarray(out[1])).max() > 1e-3
