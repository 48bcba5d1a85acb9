# SPDX-License-Identifier: Apache-2.0
"""Decode-fusion tests: fused qkv/gate_up forward == unfused; MXU padding
is transparent."""

import numpy as np
import jax
import jax.numpy as jnp

from hqq_tpu.core.quantize import BaseQuantizeConfig
from hqq_tpu.models import LlamaConfig, forward, init_cache, init_params, quantize_model
from hqq_tpu.utils.patching import fuse_for_decode, prepare_for_inference


def test_fused_decode_matches_unfused():
    cfg = LlamaConfig.tiny()
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    q = quantize_model(params, BaseQuantizeConfig(nbits=4, group_size=32),
                       compute_dtype=jnp.float32)
    i8 = prepare_for_inference(q, backend="int8")
    fused = fuse_for_decode(i8, pad_to=512)

    sa = fused["layers"][0]["self_attn"]
    assert "qkv_proj" in sa and "q_proj" not in sa
    mlp = fused["layers"][0]["mlp"]
    assert "gate_up_proj" in mlp and "gate_proj" not in mlp
    # tiny dims got padded; logical dims preserved
    assert sa["qkv_proj"].w8.shape[0] % 512 == 0
    assert sa["qkv_proj"].out_features == (
        cfg.num_attention_heads + 2 * cfg.num_key_value_heads) * cfg.head_dim_

    tok = jnp.asarray([[1, 5, 9, 2]], jnp.int32)
    c1 = init_cache(cfg, 1, 16, jnp.float32)
    c2 = init_cache(cfg, 1, 16, jnp.float32)
    l1, c1 = forward(i8, cfg, tok, c1, 0)
    l2, c2 = forward(fused, cfg, tok, c2, 0)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=1e-4, atol=1e-4)

    # and one decode step through the updated caches
    nxt = jnp.asarray([[7]], jnp.int32)
    d1, _ = forward(i8, cfg, nxt, c1, 4)
    d2, _ = forward(fused, cfg, nxt, c2, 4)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), rtol=1e-4, atol=1e-4)


def test_fused_serialization_roundtrip(tmp_path):
    from hqq_tpu.models.serialize import load_checkpoint, save_checkpoint

    cfg = LlamaConfig.tiny()
    params = init_params(cfg, jax.random.PRNGKey(1), dtype=jnp.float32)
    q = quantize_model(params, BaseQuantizeConfig(nbits=4, group_size=32),
                       compute_dtype=jnp.float32)
    fused = fuse_for_decode(prepare_for_inference(q, backend="int8"), pad_to=512)

    save_checkpoint(str(tmp_path / "ck"), fused)
    loaded, _ = load_checkpoint(str(tmp_path / "ck"))

    tok = jnp.asarray([[3, 1, 4]], jnp.int32)
    c1 = init_cache(cfg, 1, 8, jnp.float32)
    c2 = init_cache(cfg, 1, 8, jnp.float32)
    l1, _ = forward(fused, cfg, tok, c1, 0)
    l2, _ = forward(loaded, cfg, tok, c2, 0)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=1e-5, atol=1e-5)


def test_prepare_for_inference_per_tag():
    from hqq_tpu.backends.int8_backend import Int8QuantLinear
    from hqq_tpu.backends.pallas_backend import PallasQuantLinear
    from hqq_tpu.nn import QuantLinear

    cfg = LlamaConfig.tiny()
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    q = quantize_model(params, BaseQuantizeConfig(nbits=4, group_size=32),
                       compute_dtype=jnp.float32)
    mix = {
        "self_attn.q_proj": "int8",
        "self_attn.k_proj": "int8",
        "self_attn.v_proj": "int8",
        "self_attn.o_proj": "int8",
        "mlp.gate_proj": "pallas",
        "mlp.up_proj": "pallas",
        "mlp.down_proj": "xla",
    }
    out = prepare_for_inference(q, backend=mix)
    layer = out["layers"][0]
    assert isinstance(layer["self_attn"]["q_proj"], Int8QuantLinear)
    assert isinstance(layer["mlp"]["gate_proj"], PallasQuantLinear)
    assert isinstance(layer["mlp"]["down_proj"], QuantLinear)

    tok = jnp.asarray([[1, 2, 3]], jnp.int32)
    l_ref, _ = forward(q, cfg, tok)
    l_mix, _ = forward(out, cfg, tok)
    rel = np.abs(np.asarray(l_mix) - np.asarray(l_ref)).mean() / (
        np.abs(np.asarray(l_ref)).mean() + 1e-9)
    assert rel < 0.05, rel


def test_fused_lora_pallas_backend(rng):
    """HQQ+ serving: LoRALinear(QuantLinear) converts to ONE fused
    dequant+matmul+LoRA kernel with identical outputs."""
    import dataclasses as dc

    from hqq_tpu.backends.pallas_backend import PallasLoRAQuantLinear
    from hqq_tpu.core.peft import LoRALinear, PeftUtils, lora_config

    cfg = LlamaConfig.tiny()
    q = quantize_model(init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32),
                       BaseQuantizeConfig(nbits=4, group_size=32),
                       compute_dtype=jnp.float32)
    lp = PeftUtils.add_lora(q, lora_config(r=4))

    def bump(node):  # nonzero B so the adapter contributes
        if isinstance(node, dict):
            return {k: bump(v) for k, v in node.items()}
        if isinstance(node, list):
            return [bump(v) for v in node]
        if isinstance(node, LoRALinear):
            return dc.replace(node, lora_b=jnp.ones_like(node.lora_b) * 0.01)
        return node

    lp = bump(lp)
    fused = prepare_for_inference(lp, backend="pallas")
    assert isinstance(fused["layers"][0]["self_attn"]["q_proj"], PallasLoRAQuantLinear)

    tok = jnp.asarray([[1, 2, 3]], jnp.int32)
    ref, _ = forward(lp, cfg, tok)
    out, _ = forward(fused, cfg, tok)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_fuse_for_decode_gemma2_granite():
    """qkv/gate_up fusion works beyond llama: gemma2 (sandwich norms,
    softcap) and granite decode identically fused vs unfused."""
    import jax
    import numpy as np

    from hqq_tpu.core.quantize import BaseQuantizeConfig
    from hqq_tpu.models import gemma2, granite, llama
    from hqq_tpu.models.base import quantize_model
    from hqq_tpu.utils.patching import fuse_for_decode, prepare_for_inference

    for mod, cfg, init in (
        (gemma2, gemma2.Gemma2Config.tiny(), gemma2.init_params),
        (granite, granite.GraniteConfig.tiny(),
         lambda c, k, dtype: llama.init_params(c, k, dtype)),
    ):
        params = init(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
        q = quantize_model(params, BaseQuantizeConfig(nbits=4, group_size=32),
                           compute_dtype=jnp.float32)
        tokens = jnp.asarray([[3, 7, 11, 2]], jnp.int32)
        cache1 = llama.init_cache(cfg, 1, 16, jnp.float32)
        ref, _ = mod.forward(q, cfg, tokens, cache1, 0)
        fused = fuse_for_decode(prepare_for_inference(q, "w4a8"), pad_to=0)
        assert "qkv_proj" in fused["layers"][0]["self_attn"], mod.__name__
        cache2 = llama.init_cache(cfg, 1, 16, jnp.float32)
        got, _ = mod.forward(fused, cfg, tokens, cache2, 0)
        rel = float(jnp.max(jnp.abs(got - ref)) / jnp.max(jnp.abs(ref)))
        assert rel < 0.05, (mod.__name__, rel)


def test_auto_mix_plan():
    """auto_mix_plan: all-int8 with no budget; demotes the LARGEST tags to
    w4a8 under a budget; all-w4a8 under a tight one; the plan feeds straight
    into prepare_for_inference and the model still runs."""
    import numpy as np

    from hqq_tpu.core.quantize import BaseQuantizeConfig
    from hqq_tpu.models import LlamaConfig, init_params, quantize_model
    from hqq_tpu.models import llama
    from hqq_tpu.utils.patching import auto_mix_plan, prepare_for_inference

    cfg = LlamaConfig.tiny()
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    q = quantize_model(params, BaseQuantizeConfig(nbits=4, group_size=32),
                       compute_dtype=jnp.float32)

    plan = auto_mix_plan(q)
    assert plan and all(b == "int8" for b in plan.values())

    # total int8 footprint, then budget for ~60% of it: the biggest tags
    # (mlp projections) must demote first
    full = auto_mix_plan(q, hbm_budget_bytes=1 << 60)
    tight = auto_mix_plan(q, hbm_budget_bytes=1)
    assert all(b == "w4a8" for b in tight.values())

    # per-tag param sizes: find a budget between the extremes
    sizes = {}
    from hqq_tpu.models.base import iter_linears, name_to_linear_tag
    from hqq_tpu.nn.linear import QuantLinear as QL

    for path, lin in iter_linears(q):
        if isinstance(lin, QL):
            n, k = lin.qweight.shape
            sizes[name_to_linear_tag(path)] = sizes.get(name_to_linear_tag(path), 0) + n * k
    # g=32 w4a8 ≈ 0.75 B/param, int8 = 1 B/param: 0.9x sits between extremes
    total = sum(sizes.values())
    plan_mid = auto_mix_plan(q, hbm_budget_bytes=int(total * 0.9))
    assert "int8" in plan_mid.values() and "w4a8" in plan_mid.values(), plan_mid
    # the largest tag demotes first
    biggest = max(sizes, key=sizes.get)
    assert plan_mid[biggest] == "w4a8", (biggest, plan_mid)

    mixed = prepare_for_inference(q, plan_mid)
    toks = jnp.asarray([[3, 7, 11]], jnp.int32)
    l1, _ = llama.forward(mixed, cfg, toks)
    l0, _ = llama.forward(q, cfg, toks)
    rel = np.abs(np.asarray(l1) - np.asarray(l0)).max() / np.abs(np.asarray(l0)).max()
    assert rel < 0.05, rel
