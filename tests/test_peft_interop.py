# SPDX-License-Identifier: Apache-2.0
"""HF-PEFT adapter import + train-state checkpointing."""

import json

import numpy as np
import jax
import jax.numpy as jnp

from hqq_tpu.core.peft import LoRALinear, PeftUtils, TrainableParams, lora_config
from hqq_tpu.core.quantize import BaseQuantizeConfig
from hqq_tpu.models import LlamaConfig, init_params, quantize_model


def test_load_hf_peft_adapter(tmp_path, rng):
    from safetensors.numpy import save_file

    cfg = LlamaConfig.tiny()
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    qparams = quantize_model(params, BaseQuantizeConfig(nbits=4, group_size=32),
                             compute_dtype=jnp.float32)

    r, alpha, d = 4, 8, cfg.hidden_size
    # fabricate a HF-PEFT adapter for layer-0 q_proj
    nh = cfg.num_attention_heads
    hd = cfg.hidden_size // nh if cfg.head_dim is None else cfg.head_dim
    out_f = nh * hd
    A = rng.standard_normal((r, d)).astype(np.float32) * 0.01  # [r, in]
    B = rng.standard_normal((out_f, r)).astype(np.float32) * 0.01  # [out, r]
    adapter = tmp_path / "adapter"
    adapter.mkdir()
    save_file(
        {
            "base_model.model.model.layers.0.self_attn.q_proj.lora_A.weight": A,
            "base_model.model.model.layers.0.self_attn.q_proj.lora_B.weight": B,
        },
        str(adapter / "adapter_model.safetensors"),
    )
    (adapter / "adapter_config.json").write_text(
        json.dumps({"r": r, "lora_alpha": alpha, "target_modules": ["q_proj"]})
    )

    lparams = PeftUtils.load_hf_adapter(qparams, str(adapter))
    layer = lparams["layers"][0]["self_attn"]["q_proj"]
    assert isinstance(layer, LoRALinear)
    assert layer.scaling == alpha / r
    # untouched layers stay bare
    assert not isinstance(lparams["layers"][1]["self_attn"]["q_proj"], LoRALinear)

    x = jnp.asarray(rng.standard_normal((2, d)).astype(np.float32))
    base_out = qparams["layers"][0]["self_attn"]["q_proj"](x)
    expect = base_out + (x @ A.T) @ B.T * (alpha / r)
    np.testing.assert_allclose(
        np.asarray(layer(x)), np.asarray(expect), rtol=1e-4, atol=1e-4
    )


def test_train_state_checkpoint_roundtrip(tmp_path):
    import optax

    from hqq_tpu.utils.training import load_train_state, save_train_state

    cfg = LlamaConfig.tiny(vocab_size=128)
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    q = quantize_model(params, BaseQuantizeConfig(nbits=4, group_size=32),
                       compute_dtype=jnp.float32)
    lp = PeftUtils.add_lora(q, lora_config(r=2, lora_alpha=2))
    trainable = TrainableParams(lp)
    vals = trainable.values()

    opt = optax.adamw(1e-3)
    state = opt.init(vals)

    save_train_state(str(tmp_path / "ts"), vals, state, step=7)
    vals2, state2, step = load_train_state(str(tmp_path / "ts"), opt.init(vals))
    assert step == 7
    for a, b in zip(vals, vals2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    l1 = jax.tree_util.tree_leaves(state)
    l2 = jax.tree_util.tree_leaves(state2)
    assert len(l1) == len(l2)
    for a, b in zip(l1, l2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
