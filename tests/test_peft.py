# SPDX-License-Identifier: Apache-2.0
"""HQQ+ / LoRA tests (≙ reference core/peft.py behaviors): no-op init,
training step reduces loss, merge-and-requantize, save/load, fake-quant."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import optax

from hqq_tpu.core.peft import (
    FakeQuantLoRALinear,
    LoRALinear,
    PeftUtils,
    TrainableParams,
    lora_config,
)
from hqq_tpu.core.quantize import BaseQuantizeConfig
from hqq_tpu.models import LlamaConfig, forward, init_params, quantize_model
from hqq_tpu.nn import QuantLinear
from hqq_tpu.utils.training import causal_lm_loss, make_lora_train_step


@pytest.fixture(scope="module")
def qlayer(rng):
    w = (np.random.default_rng(7).standard_normal((64, 128)) / 10).astype(np.float32)
    return QuantLinear.quantize(
        jnp.asarray(w), None, nbits=4, group_size=32, round_zero=True,
        compute_dtype=jnp.float32,
    )


def test_lora_noop_at_init(qlayer):
    lora = LoRALinear.wrap(qlayer, r=8, lora_alpha=8)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((4, 128)), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(lora(x)), np.asarray(qlayer(x)), rtol=1e-6
    )


def test_lora_forward_delta(qlayer):
    lora = LoRALinear.wrap(qlayer, r=4, lora_alpha=8)
    lora = lora.replace(lora_b=jnp.ones_like(lora.lora_b) * 0.01)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((4, 128)), jnp.float32)
    y = np.asarray(lora(x))
    expected = np.asarray(qlayer(x)) + np.asarray(
        (x @ lora.lora_a) @ lora.lora_b * lora.scaling
    )
    np.testing.assert_allclose(y, expected, rtol=1e-5, atol=1e-6)


def test_merge_and_quantize(qlayer):
    lora = LoRALinear.wrap(qlayer, r=4, lora_alpha=8)
    key = jax.random.PRNGKey(5)
    lora = lora.replace(lora_b=jax.random.normal(key, lora.lora_b.shape) * 0.01)
    merged = lora.merge_and_quantize()
    assert isinstance(merged, QuantLinear)
    # the merged weight must equal W + AB^T up to one 4-bit quantization step
    w_target = np.asarray(lora.merged_weight(jnp.float32))
    w_merged = np.asarray(merged.dequantize(jnp.float32))
    step = (w_target.max() - w_target.min()) / 15
    assert np.abs(w_merged - w_target).max() < step, "requant error above one step"
    # outputs agree up to accumulated requantization noise
    x = jnp.asarray(np.random.default_rng(0).standard_normal((4, 128)), jnp.float32)
    d = np.abs(np.asarray(merged(x)) - np.asarray(lora(x)))
    assert d.mean() < 0.1 and d.max() < 0.5


def test_fake_quant_lora(qlayer):
    lora = LoRALinear.wrap(qlayer, r=4)
    fq = FakeQuantLoRALinear.wrap(lora, nbits=4, group_size=32)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 128)), jnp.float32)
    y = fq(x)
    assert np.isfinite(np.asarray(y)).all()
    # gradient flows through the straight-through estimator to lora_b
    g = jax.grad(lambda b: jnp.sum(fq.replace(lora_b=b)(x) ** 2))(fq.lora_b)
    assert float(jnp.abs(g).max()) > 0


@pytest.fixture(scope="module")
def lora_model():
    cfg = LlamaConfig.tiny()
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    qparams = quantize_model(
        params, BaseQuantizeConfig(nbits=2, group_size=32), compute_dtype=jnp.float32
    )
    lparams = PeftUtils.add_lora(qparams, lora_config(r=4, lora_alpha=8))
    return cfg, lparams


def test_add_lora_structure(lora_model):
    cfg, lparams = lora_model
    l0 = lparams["layers"][0]
    assert isinstance(l0["self_attn"]["q_proj"], LoRALinear)
    assert isinstance(l0["self_attn"]["q_proj"].base, QuantLinear)
    # lm_head not wrapped
    assert not isinstance(lparams["lm_head"], LoRALinear)


def test_trainable_partition(lora_model):
    cfg, lparams = lora_model
    tp = TrainableParams(lparams)
    vals = tp.values()
    # 2 layers x 7 linears x (A, B)
    assert len(vals) == 2 * 7 * 2
    rebuilt = tp.inject(vals, lparams)
    x = jnp.asarray([[1, 2, 3]], jnp.int32)
    a, _ = forward(lparams, cfg, x)
    b, _ = forward(rebuilt, cfg, x)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_lora_training_reduces_loss(lora_model):
    cfg, lparams = lora_model
    tp = TrainableParams(lparams)
    train_vals = tp.values()
    optimizer = optax.adam(5e-3)
    opt_state = optimizer.init(train_vals)
    step = make_lora_train_step(cfg, tp, optimizer)

    batch = jnp.asarray(
        np.random.default_rng(0).integers(0, cfg.vocab_size, (4, 16)), jnp.int32
    )
    losses = []
    for _ in range(10):
        train_vals, opt_state, loss = step(train_vals, opt_state, lparams, batch)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses
    # frozen backbone untouched; only adapters trained
    assert np.abs(np.asarray(train_vals[1])).max() > 0  # some B became nonzero


def test_lora_save_load(lora_model, tmp_path):
    cfg, lparams = lora_model
    # perturb adapters so save/load is non-trivial
    tp = TrainableParams(lparams)
    vals = [v + 0.01 for v in tp.values()]
    lparams2 = tp.inject(vals, lparams)

    path = str(tmp_path / "adapters.safetensors")
    PeftUtils.save_lora_weights(lparams2, path)
    restored = PeftUtils.load_lora_weights(lparams, path)

    x = jnp.asarray([[3, 1, 4]], jnp.int32)
    a, _ = forward(lparams2, cfg, x)
    b, _ = forward(restored, cfg, x)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_merge_lora_model(lora_model):
    cfg, lparams = lora_model
    merged = PeftUtils.merge_lora(lparams)
    l0 = merged["layers"][0]
    assert isinstance(l0["self_attn"]["q_proj"], QuantLinear)


def test_cast_lora(lora_model):
    cfg, lparams = lora_model
    cast = PeftUtils.cast_lora_weights(lparams, jnp.bfloat16)
    assert cast["layers"][0]["self_attn"]["q_proj"].lora_a.dtype == jnp.bfloat16


def test_grouped_proj_linear(rng):
    """GroupedProjLinear: identity init == base layer; training the proj
    reduces reconstruction error (≙ ref HQQLinearGroupedProj)."""
    import jax
    import jax.numpy as jnp
    from hqq_tpu.core.peft import GroupedProjLinear
    from hqq_tpu.nn import QuantLinear

    w = rng.standard_normal((64, 32)).astype(np.float32)
    base = QuantLinear.quantize(jnp.asarray(w), None, nbits=2, group_size=32,
                                compute_dtype=jnp.float32)
    gp = GroupedProjLinear.wrap(base, proj_size=8)
    x = jnp.asarray(rng.standard_normal((4, 32)).astype(np.float32))

    # identity proj == base forward
    np.testing.assert_allclose(
        np.asarray(gp(x)), np.asarray(base(x)), rtol=1e-5, atol=1e-5
    )

    # a few gradient steps on proj shrink ||W_fp - W'||
    target = jnp.asarray(w)

    def loss_fn(proj):
        import dataclasses as dc
        w_p = dc.replace(gp, proj=proj).projected_weight(jnp.float32)
        return jnp.mean((w_p - target) ** 2)

    proj = gp.proj
    l0 = float(loss_fn(proj))
    g = jax.jit(jax.grad(loss_fn))
    for _ in range(100):
        proj = proj - 2.0 * g(proj)
    l1 = float(loss_fn(proj))
    assert l1 < l0 * 0.9, f"proj training did not improve: {l0} -> {l1}"
