# SPDX-License-Identifier: Apache-2.0
"""End-to-end PPL-delta parity vs the reference stack (VERDICT r1 item 4).

The BASELINE quality target is "quantized PPL within 0.05 of reference
HQQ" under the reference's eval protocol (sliding window max_length/stride,
ppl = exp(Σ ll / end_loc) — `/root/reference/examples/llama2_benchmark/
eval_model.py:12-52`). No WikiText checkpoint is downloadable here, so this
test runs the FULL protocol on a tiny HF Llama with a synthetic token
stream: quantize the same model with the imported torch reference AND with
hqq_tpu (same config), compute PPL with each stack's own pipeline, and
require the quantization-induced PPL deltas to agree.

This exercises every layer end-to-end (HF load → model-level quantize →
forward → windowed PPL), not just array-level parity."""

import sys

import numpy as np
import pytest
import jax.numpy as jnp

MAX_LENGTH, STRIDE, SEQ_LEN = 128, 64, 384


def _ref_modules():
    sys.path.insert(0, "/root/reference")
    try:
        from hqq.core.quantize import BaseQuantizeConfig as RefCfg  # type: ignore
        from hqq.core.quantize import HQQBackend, HQQLinear  # type: ignore

        return RefCfg, HQQLinear, HQQBackend
    except Exception:
        return None, None, None
    finally:
        sys.path.pop(0)


def _torch_windowed_ppl(model, tokens, torch):
    """The reference protocol, torch-side (eval_model.py:12-52)."""
    import torch.nn.functional as F

    nll_sum, end_loc = 0.0, 0
    prev_end = 0
    with torch.no_grad():
        for begin in range(0, SEQ_LEN, STRIDE):
            end = min(begin + MAX_LENGTH, SEQ_LEN)
            trg_len = end - prev_end
            ids = tokens[:, begin:end]
            logits = model(ids).logits.float()
            lp = F.log_softmax(logits[:, :-1], dim=-1)
            tgt = ids[:, 1:]
            ll = lp.gather(-1, tgt[..., None])[..., 0]  # [1, T-1]
            take = min(trg_len, ll.shape[1])
            nll_sum += -ll[0, -take:].sum().item()
            prev_end = end
            end_loc = end
            if end == SEQ_LEN:
                break
    return float(np.exp(nll_sum / end_loc))


# The parity gate covers the BASELINE quality modes, not just the easy
# default: 4-bit g64-class axis=1 (the headline config), 3-bit axis=1, and
# 2-bit g16 axis=0 (the quality grouping the reference's native kernel layer
# exists for, `/root/reference/hqq/kernels/hqq_aten_cuda.cpp:42`).
@pytest.mark.parametrize(
    "NBITS,GROUP,AXIS",
    [(4, 32, 1), (3, 64, 1), (2, 16, 0)],
    ids=["4b-ax1", "3b-ax1", "2b-g16-ax0"],
)
def test_ppl_delta_matches_reference(tmp_path, NBITS, GROUP, AXIS):
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    RefCfg, HQQLinear, HQQBackend = _ref_modules()
    if HQQLinear is None:
        pytest.skip("reference hqq not importable")

    torch.manual_seed(0)
    hf_cfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512, tie_word_embeddings=False,
    )
    model = transformers.LlamaForCausalLM(hf_cfg).eval().float()
    rng = np.random.default_rng(0)
    stream = rng.integers(0, hf_cfg.vocab_size, SEQ_LEN)
    t_tokens = torch.as_tensor(stream[None], dtype=torch.long)

    # ---- torch/reference stack: fp PPL, quantize, q PPL ----
    ppl_fp_ref = _torch_windowed_ppl(model, t_tokens, torch)
    HQQLinear.set_backend(HQQBackend.PYTORCH)
    qcfg = RefCfg(nbits=NBITS, group_size=GROUP, axis=AXIS)
    for layer in model.model.layers:
        for parent, name in (
            (layer.self_attn, "q_proj"), (layer.self_attn, "k_proj"),
            (layer.self_attn, "v_proj"), (layer.self_attn, "o_proj"),
            (layer.mlp, "gate_proj"), (layer.mlp, "up_proj"),
            (layer.mlp, "down_proj"),
        ):
            lin = getattr(parent, name)
            setattr(
                parent, name,
                HQQLinear(lin, quant_config=dict(qcfg), compute_dtype=torch.float32,
                          device="cpu"),
            )
    ppl_q_ref = _torch_windowed_ppl(model, t_tokens, torch)
    delta_ref = ppl_q_ref - ppl_fp_ref

    # ---- hqq_tpu stack: same weights through our whole pipeline ----
    from hqq_tpu.core.quantize import BaseQuantizeConfig
    from hqq_tpu.models import hf as hf_loader
    from hqq_tpu.models import llama
    from hqq_tpu.models.base import quantize_model
    from hqq_tpu.utils.eval import perplexity

    # re-create the fp model (the torch one was quantized in place)
    torch.manual_seed(0)
    model_fp = transformers.LlamaForCausalLM(hf_cfg).eval().float()
    cfg = llama.LlamaConfig.from_hf(hf_cfg.to_dict())
    params = hf_loader.params_from_hf_state_dict(
        model_fp.state_dict(), cfg, jnp.float32
    )
    jtok = jnp.asarray(stream[None], jnp.int32)
    ppl_fp = perplexity(params, cfg, jtok, max_length=MAX_LENGTH, stride=STRIDE)
    qparams = quantize_model(
        params, BaseQuantizeConfig(nbits=NBITS, group_size=GROUP, axis=AXIS),
        compute_dtype=jnp.float32,
    )
    ppl_q = perplexity(qparams, cfg, jtok, max_length=MAX_LENGTH, stride=STRIDE)
    delta = ppl_q - ppl_fp

    # fp pipelines must agree outright (same model, same protocol)
    assert abs(ppl_fp - ppl_fp_ref) < 0.05, (ppl_fp, ppl_fp_ref)
    # the BASELINE criterion, stack-vs-stack: quantization-induced deltas
    # must match. 0.05 absolute is the 4-bit bar; low-bit configs on a tiny
    # RANDOM model sit at PPL deltas of tens (the weights carry no structure
    # to preserve), where identical quantization math still leaves fp
    # accumulation-order differences between torch and XLA — scale the bound
    # by the delta itself there (3%), keeping 0.05 when deltas are small.
    tol = max(0.05, 0.03 * abs(delta_ref))
    assert abs(delta - delta_ref) < tol, (
        f"delta ours={delta:+.4f} vs ref={delta_ref:+.4f} (tol {tol:.3f}, "
        f"fp {ppl_fp:.4f}/{ppl_fp_ref:.4f}, q {ppl_q:.4f}/{ppl_q_ref:.4f})"
    )


def _make_markov_stream(n, rng, vocab=128):
    """Order-1 markov chain with 10% noise — a learnable distribution whose
    trained model has STRUCTURED weights (VERDICT r4 item 5: random-weight
    deltas sit in the tens; the reference's published 4-bit deltas are
    hundredths, which needs weights that encode something to preserve)."""
    out = np.zeros(n, np.int64)
    cur = 5
    for i in range(n):
        if rng.random() < 0.9:
            cur = (3 * cur + 7) % 119
        else:
            cur = int(rng.integers(0, vocab))
        out[i] = cur
    return out


def test_ppl_delta_structured_weights_absolute():
    """BASELINE's quality line, asserted at its own 0.05 ABSOLUTE bar: a
    briefly-trained tiny Llama (fp PPL ~2.2 on its markov stream — weights
    carry real structure) quantized 4-bit g64 must (a) move PPL by less than
    0.05 in our stack, and (b) agree with the imported torch reference's
    delta to 0.05 absolute — the regime of the reference's published numbers
    (`/root/reference/examples/llama2_benchmark/eval_model.py:12-52`), not
    the delta-scaled tolerance the random-weight cases need."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    RefCfg, HQQLinear, HQQBackend = _ref_modules()
    if HQQLinear is None:
        pytest.skip("reference hqq not importable")

    torch.manual_seed(0)
    hf_cfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512, tie_word_embeddings=False,
    )
    model = transformers.LlamaForCausalLM(hf_cfg).float()
    rng = np.random.default_rng(0)
    opt = torch.optim.Adam(model.parameters(), lr=1e-3)
    for _ in range(500):
        ids = torch.as_tensor(_make_markov_stream(128, rng)[None])
        out = model(ids, labels=ids)
        opt.zero_grad()
        out.loss.backward()
        opt.step()
    model = model.eval()
    trained_sd = {k: v.clone() for k, v in model.state_dict().items()}

    stream = _make_markov_stream(SEQ_LEN, np.random.default_rng(1))
    t_tokens = torch.as_tensor(stream[None], dtype=torch.long)

    # ---- torch/reference stack ----
    ppl_fp_ref = _torch_windowed_ppl(model, t_tokens, torch)
    assert ppl_fp_ref < 4.0, f"training failed to structure weights: {ppl_fp_ref}"
    HQQLinear.set_backend(HQQBackend.PYTORCH)
    qcfg = RefCfg(nbits=4, group_size=64, axis=1)
    for layer in model.model.layers:
        for parent, name in (
            (layer.self_attn, "q_proj"), (layer.self_attn, "k_proj"),
            (layer.self_attn, "v_proj"), (layer.self_attn, "o_proj"),
            (layer.mlp, "gate_proj"), (layer.mlp, "up_proj"),
            (layer.mlp, "down_proj"),
        ):
            lin = getattr(parent, name)
            setattr(parent, name,
                    HQQLinear(lin, quant_config=dict(qcfg),
                              compute_dtype=torch.float32, device="cpu"))
    ppl_q_ref = _torch_windowed_ppl(model, t_tokens, torch)
    delta_ref = ppl_q_ref - ppl_fp_ref

    # ---- hqq_tpu stack on the same trained weights ----
    from hqq_tpu.core.quantize import BaseQuantizeConfig
    from hqq_tpu.models import hf as hf_loader
    from hqq_tpu.models import llama
    from hqq_tpu.models.base import quantize_model
    from hqq_tpu.utils.eval import perplexity

    cfg = llama.LlamaConfig.from_hf(hf_cfg.to_dict())
    params = hf_loader.params_from_hf_state_dict(trained_sd, cfg, jnp.float32)
    jtok = jnp.asarray(stream[None], jnp.int32)
    ppl_fp = perplexity(params, cfg, jtok, max_length=MAX_LENGTH, stride=STRIDE)
    qparams = quantize_model(
        params, BaseQuantizeConfig(nbits=4, group_size=64, axis=1),
        compute_dtype=jnp.float32,
    )
    ppl_q = perplexity(qparams, cfg, jtok, max_length=MAX_LENGTH, stride=STRIDE)
    delta = ppl_q - ppl_fp

    assert abs(ppl_fp - ppl_fp_ref) < 0.05, (ppl_fp, ppl_fp_ref)
    # the reference's own published regime: hundredths of PPL at 4-bit
    assert abs(delta) < 0.05, f"4b/g64 structured delta {delta:+.4f}"
    assert abs(delta - delta_ref) < 0.05, (
        f"delta ours={delta:+.4f} vs ref={delta_ref:+.4f} "
        f"(fp {ppl_fp:.4f}/{ppl_fp_ref:.4f}, q {ppl_q:.4f}/{ppl_q_ref:.4f})"
    )

    # the quantized lm_head OPT-IN keeps the absolute bar too (VERDICT r4
    # item 2's quality evidence: lm_head quantization is servable)
    qh = quantize_model(
        params, BaseQuantizeConfig(nbits=4, group_size=64, axis=1),
        compute_dtype=jnp.float32, ignore=(),
    )
    ppl_qh = perplexity(qh, cfg, jtok, max_length=MAX_LENGTH, stride=STRIDE)
    assert abs(ppl_qh - ppl_fp) < 0.05, f"qhead delta {ppl_qh - ppl_fp:+.4f}"
