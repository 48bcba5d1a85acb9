# SPDX-License-Identifier: Apache-2.0
"""Whisper encoder-decoder: HF parity, cached decode consistency, quantize."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from hqq_tpu.core.quantize import BaseQuantizeConfig
from hqq_tpu.models import whisper
from hqq_tpu.models.base import quantize_model


@pytest.fixture(scope="module")
def tiny():
    cfg = whisper.WhisperConfig.tiny()
    params = whisper.init_params(cfg, jax.random.PRNGKey(0))
    return cfg, params


def test_whisper_shapes(tiny):
    cfg, params = tiny
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal(
        (2, cfg.num_mel_bins, cfg.max_source_positions * 2)).astype(np.float32))
    toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 6)), jnp.int32)
    logits = whisper.forward(params, cfg, mel, toks)
    assert logits.shape == (2, 6, cfg.vocab_size)
    assert np.isfinite(np.asarray(logits)).all()


def test_whisper_hf_logits_parity():
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")

    hf_cfg = transformers.WhisperConfig(
        vocab_size=51200, d_model=64, encoder_layers=2, decoder_layers=2,
        encoder_attention_heads=4, decoder_attention_heads=4,
        encoder_ffn_dim=128, decoder_ffn_dim=128,
        max_source_positions=32, max_target_positions=24, num_mel_bins=16,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    model = transformers.WhisperForConditionalGeneration(hf_cfg).eval().float()

    cfg = whisper.WhisperConfig.from_hf(hf_cfg.to_dict())
    params = whisper.params_from_hf_state_dict(dict(model.state_dict()), cfg)

    rng = np.random.default_rng(0)
    mel = rng.standard_normal((1, 16, 64)).astype(np.float32)
    toks = np.array([[5, 17, 93, 41]], dtype=np.int64)
    with torch.no_grad():
        ref = model(
            input_features=torch.from_numpy(mel),
            decoder_input_ids=torch.from_numpy(toks),
        ).logits.numpy()
    ours = whisper.forward(params, cfg, jnp.asarray(mel), jnp.asarray(toks, jnp.int32))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=3e-4, atol=3e-4)


def test_whisper_cached_decode_matches_full(tiny):
    cfg, params = tiny
    rng = np.random.default_rng(1)
    mel = jnp.asarray(rng.standard_normal((1, cfg.num_mel_bins, 40)).astype(np.float32))
    T = 8
    toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, T)), jnp.int32)

    enc = whisper.encode(params, cfg, mel)
    cross = whisper.precompute_cross_kv(params, cfg, enc)
    logits_full, _ = whisper.decode(params, cfg, toks, cross, cache=None)

    cache = whisper.init_decoder_cache(cfg, batch=1, max_len=16)
    _, cache = whisper.decode(params, cfg, toks[:, :4], cross, cache, start_pos=0)
    outs = []
    for i in range(4, T):
        lg, cache = whisper.decode(params, cfg, toks[:, i:i+1], cross, cache, start_pos=i)
        outs.append(lg[:, 0])
    decoded = np.stack([np.asarray(o) for o in outs], axis=1)
    np.testing.assert_allclose(
        decoded, np.asarray(logits_full[:, 4:]), rtol=2e-3, atol=2e-3
    )


def test_whisper_quantize_per_tower(tiny):
    from hqq_tpu.models.base import iter_linears, name_to_linear_tag
    from hqq_tpu.nn import Linear, QuantLinear

    cfg, params = tiny
    # encoder 8-bit, decoder 4-bit — per-tag configs like the reference's
    # whisper example (separate encoder/decoder configs)
    tags = set()
    for path, _ in iter_linears(params):
        tags.add(name_to_linear_tag(path))
    qcfg = {}
    for tag in tags:
        nbits = 8 if tag.startswith("encoder") else 4
        qcfg[tag] = BaseQuantizeConfig(nbits=nbits, group_size=16)
    qparams = quantize_model(params, qcfg, compute_dtype=jnp.float32)

    n_q = 0
    for path, layer in iter_linears(qparams):
        assert isinstance(layer, QuantLinear), path
        tag = name_to_linear_tag(path)
        expect = 8 if tag.startswith("encoder") else 4
        assert layer.qweight.nbits == expect, (path, layer.qweight.nbits)
        n_q += 1
    assert n_q == cfg.encoder_layers * 6 + cfg.decoder_layers * 10

    rng = np.random.default_rng(2)
    mel = jnp.asarray(rng.standard_normal((1, cfg.num_mel_bins, 40)).astype(np.float32))
    toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, 4)), jnp.int32)
    lq = whisper.forward(qparams, cfg, mel, toks)
    lf = whisper.forward(params, cfg, mel, toks)
    rel = np.abs(np.asarray(lq) - np.asarray(lf)).mean() / (
        np.abs(np.asarray(lf)).mean() + 1e-9)
    assert rel < 0.5, rel


def test_whisper_engine_quantize_save_load_transcribe(tiny, tmp_path):
    """Engine facade: per-tower quantize -> save -> load -> transcribe
    equality (≙ the reference's whisper example workflow)."""
    from hqq_tpu.engine.whisper import AutoHQQWhisperModel, HQQWhisperModel

    cfg, params = tiny
    rng = np.random.default_rng(5)
    mel = rng.standard_normal((1, cfg.num_mel_bins, 40)).astype(np.float32)

    m = HQQWhisperModel(params=params, cfg=cfg).quantize_model(
        BaseQuantizeConfig(nbits=4, group_size=16),
        encoder_config=BaseQuantizeConfig(nbits=8, group_size=16),
        compute_dtype=jnp.float32,
    )
    ref = m.transcribe(mel, forced_ids=[1, 2], max_new_tokens=6)
    assert len(ref) == 6

    m.save_quantized(str(tmp_path / "whisper"))
    loaded = AutoHQQWhisperModel.from_quantized(str(tmp_path / "whisper"))
    assert loaded.cfg == cfg
    got = loaded.transcribe(mel, forced_ids=[1, 2], max_new_tokens=6)
    assert got == ref


def test_whisper_engine_from_pretrained_hf_dir(tmp_path):
    """from_pretrained on an HF-format whisper dir matches direct mapping."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    import json
    import safetensors.torch as st

    hf_cfg = transformers.WhisperConfig(
        vocab_size=128, num_mel_bins=16, d_model=32,
        encoder_layers=2, decoder_layers=2,
        encoder_attention_heads=4, decoder_attention_heads=4,
        encoder_ffn_dim=64, decoder_ffn_dim=64,
        max_source_positions=24, max_target_positions=24,
        pad_token_id=0, bos_token_id=1, eos_token_id=2,
        decoder_start_token_id=1,
    )
    torch.manual_seed(0)
    hf = transformers.WhisperForConditionalGeneration(hf_cfg).eval().float()
    d = tmp_path / "hf_whisper"
    d.mkdir()
    (d / "config.json").write_text(json.dumps(hf_cfg.to_dict()))
    st.save_file({k: v.contiguous() for k, v in hf.state_dict().items()
                  if k != "proj_out.weight"},  # tied to embed_tokens
                 str(d / "model.safetensors"))

    from hqq_tpu.engine.whisper import AutoHQQWhisperModel

    m = AutoHQQWhisperModel.from_pretrained(str(d))
    rng = np.random.default_rng(0)
    # HF requires mel frames == max_source_positions * 2 (conv stride)
    mel = rng.standard_normal((1, 16, 48)).astype(np.float32)
    toks = np.array([[3, 7, 11]], np.int64)
    with torch.no_grad():
        ref = hf(input_features=torch.from_numpy(mel),
                 decoder_input_ids=torch.from_numpy(toks)).logits.numpy()
    ours = np.asarray(whisper.forward(
        m.params, m.cfg, jnp.asarray(mel), jnp.asarray(toks, jnp.int32)
    ))
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=2e-3)
