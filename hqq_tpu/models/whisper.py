# SPDX-License-Identifier: Apache-2.0
"""Whisper (speech-to-text encoder-decoder) — functional JAX implementation.

The reference quantizes Whisper only through its examples
(`/root/reference/examples/` model-zoo scripts patching the HF torch model);
here it is a first-class family: the conv+transformer encoder runs once, the
decoder decodes with a static self-attention KV cache plus precomputed
cross-attention K/V, and every projection quantizes through the same
`quantize_model` tree walker (per-tower tags: `encoder.self_attn.q_proj` vs
`decoder.encoder_attn.q_proj`, so encoder/decoder can get different configs
like the reference example does).

HF `WhisperForConditionalGeneration` conventions: pre-LN blocks, learned
positions on both towers, q scaled by head_dim**-0.5, k_proj without bias,
gelu (exact), proj_out tied to the decoder token embedding.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct
from jax import Array

from ..nn.linear import Linear
from .llama import KVCache, _update_stacked_cache

__all__ = [
    "WhisperConfig",
    "init_params",
    "encode",
    "decode",
    "forward",
    "init_decoder_cache",
    "precompute_cross_kv",
    "LINEAR_TAGS",
]

LINEAR_TAGS = tuple(
    f"{tower}.{blk}.{proj}"
    for tower in ("encoder", "decoder")
    for blk, proj in (
        [("self_attn", p) for p in ("q_proj", "k_proj", "v_proj", "out_proj")]
        + ([("encoder_attn", p) for p in ("q_proj", "k_proj", "v_proj", "out_proj")]
           if tower == "decoder" else [])
        + [("", "fc1"), ("", "fc2")]
    )
    if blk
) + ("encoder.fc1", "encoder.fc2", "decoder.fc1", "decoder.fc2")


@dataclass(frozen=True)
class WhisperConfig:
    vocab_size: int = 51865
    num_mel_bins: int = 80
    d_model: int = 512
    encoder_layers: int = 6
    decoder_layers: int = 6
    encoder_attention_heads: int = 8
    decoder_attention_heads: int = 8
    encoder_ffn_dim: int = 2048
    decoder_ffn_dim: int = 2048
    max_source_positions: int = 1500
    max_target_positions: int = 448

    @property
    def head_dim_(self) -> int:
        return self.d_model // self.decoder_attention_heads

    # llama.KVCache compatibility for the decoder self-attn cache
    @property
    def num_hidden_layers(self) -> int:
        return self.decoder_layers

    @property
    def num_key_value_heads(self) -> int:
        return self.decoder_attention_heads

    @classmethod
    def from_hf(cls, hf: dict) -> "WhisperConfig":
        return cls(
            vocab_size=hf["vocab_size"],
            num_mel_bins=hf.get("num_mel_bins", 80),
            d_model=hf["d_model"],
            encoder_layers=hf["encoder_layers"],
            decoder_layers=hf["decoder_layers"],
            encoder_attention_heads=hf["encoder_attention_heads"],
            decoder_attention_heads=hf["decoder_attention_heads"],
            encoder_ffn_dim=hf["encoder_ffn_dim"],
            decoder_ffn_dim=hf["decoder_ffn_dim"],
            max_source_positions=hf.get("max_source_positions", 1500),
            max_target_positions=hf.get("max_target_positions", 448),
        )

    @classmethod
    def tiny(cls) -> "WhisperConfig":
        return cls(
            vocab_size=256,
            num_mel_bins=16,
            d_model=64,
            encoder_layers=2,
            decoder_layers=2,
            encoder_attention_heads=4,
            decoder_attention_heads=4,
            encoder_ffn_dim=128,
            decoder_ffn_dim=128,
            max_source_positions=32,
            max_target_positions=24,
        )


def _ln_p(n, dtype):
    return {"weight": jnp.ones((n,), dtype), "bias": jnp.zeros((n,), dtype)}


def init_params(cfg: WhisperConfig, key: Array, dtype=jnp.float32) -> dict:
    ks = iter(jax.random.split(key, 16 + 12 * (cfg.encoder_layers + cfg.decoder_layers)))
    d = cfg.d_model

    def lin(out_f, in_f, bias=True):
        w = jax.random.normal(next(ks), (out_f, in_f), jnp.float32) / jnp.sqrt(in_f)
        return Linear(
            weight=w.astype(dtype),
            bias=jnp.zeros((out_f,), dtype) if bias else None,
        )

    def attn(cross=False):
        return {
            "q_proj": lin(d, d),
            "k_proj": lin(d, d, bias=False),  # HF whisper: k has no bias
            "v_proj": lin(d, d),
            "out_proj": lin(d, d),
        }

    def enc_layer():
        return {
            "self_attn_layer_norm": _ln_p(d, dtype),
            "self_attn": attn(),
            "final_layer_norm": _ln_p(d, dtype),
            "fc1": lin(cfg.encoder_ffn_dim, d),
            "fc2": lin(d, cfg.encoder_ffn_dim),
        }

    def dec_layer():
        return {
            "self_attn_layer_norm": _ln_p(d, dtype),
            "self_attn": attn(),
            "encoder_attn_layer_norm": _ln_p(d, dtype),
            "encoder_attn": attn(cross=True),
            "final_layer_norm": _ln_p(d, dtype),
            "fc1": lin(cfg.decoder_ffn_dim, d),
            "fc2": lin(d, cfg.decoder_ffn_dim),
        }

    conv1 = jax.random.normal(next(ks), (d, cfg.num_mel_bins, 3), jnp.float32) * 0.02
    conv2 = jax.random.normal(next(ks), (d, d, 3), jnp.float32) * 0.02
    return {
        "encoder": {
            "conv1": {"weight": conv1.astype(dtype), "bias": jnp.zeros((d,), dtype)},
            "conv2": {"weight": conv2.astype(dtype), "bias": jnp.zeros((d,), dtype)},
            "embed_positions": (
                jax.random.normal(next(ks), (cfg.max_source_positions, d), jnp.float32)
                * 0.02
            ).astype(dtype),
            "layers": [enc_layer() for _ in range(cfg.encoder_layers)],
            "layer_norm": _ln_p(d, dtype),
        },
        "decoder": {
            "embed_tokens": (
                jax.random.normal(next(ks), (cfg.vocab_size, d), jnp.float32) * 0.02
            ).astype(dtype),
            "embed_positions": (
                jax.random.normal(next(ks), (cfg.max_target_positions, d), jnp.float32)
                * 0.02
            ).astype(dtype),
            "layers": [dec_layer() for _ in range(cfg.decoder_layers)],
            "layer_norm": _ln_p(d, dtype),
        },
    }


def _layer_norm(x: Array, p: dict, eps: float = 1e-5) -> Array:
    dt = x.dtype
    x = x.astype(jnp.float32)
    mu = x.mean(axis=-1, keepdims=True)
    var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
    x = (x - mu) * jax.lax.rsqrt(var + eps)
    return (x * p["weight"].astype(jnp.float32) + p["bias"].astype(jnp.float32)).astype(dt)


def _mha(attn: dict, nh: int, x_q: Array, x_kv: Array, mask: Optional[Array]) -> Array:
    """Full (uncached) multi-head attention; q scaled like HF Whisper."""
    b, tq, d = x_q.shape
    hd = d // nh
    q = attn["q_proj"](x_q) * (hd**-0.5)
    k = attn["k_proj"](x_kv)
    v = attn["v_proj"](x_kv)
    q = q.reshape(b, tq, nh, hd).transpose(0, 2, 1, 3)
    k = k.reshape(b, -1, nh, hd).transpose(0, 2, 1, 3)
    v = v.reshape(b, -1, nh, hd).transpose(0, 2, 1, 3)
    scores = jnp.einsum("bhtd,bhsd->bhts", q, k, preferred_element_type=jnp.float32)
    if mask is not None:
        scores = scores + mask
    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    out = jnp.einsum("bhts,bhsd->bhtd", probs, v)
    return attn["out_proj"](out.transpose(0, 2, 1, 3).reshape(b, tq, d))


def _conv1d(x: Array, w: Array, b: Array, stride: int) -> Array:
    """x [B, C_in, T], w [C_out, C_in, 3], 'same'-style padding 1."""
    out = jax.lax.conv_general_dilated(
        x.astype(jnp.float32),
        w.astype(jnp.float32),
        window_strides=(stride,),
        padding=[(1, 1)],
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    return out + b.astype(jnp.float32)[None, :, None]


def encode(params: dict, cfg: WhisperConfig, mel: Array) -> Array:
    """mel [B, num_mel_bins, T] -> encoder states [B, T//2, d_model]."""
    enc = params["encoder"]
    x = jax.nn.gelu(_conv1d(mel, enc["conv1"]["weight"], enc["conv1"]["bias"], 1),
                    approximate=False)
    x = jax.nn.gelu(_conv1d(x, enc["conv2"]["weight"], enc["conv2"]["bias"], 2),
                    approximate=False)
    x = x.transpose(0, 2, 1)  # [B, T', D]
    dtype = enc["embed_positions"].dtype
    x = x.astype(dtype) + enc["embed_positions"][None, : x.shape[1]]

    for layer in enc["layers"]:
        h = _layer_norm(x, layer["self_attn_layer_norm"])
        x = x + _mha(layer["self_attn"], cfg.encoder_attention_heads, h, h, None)
        h = _layer_norm(x, layer["final_layer_norm"])
        x = x + layer["fc2"](jax.nn.gelu(layer["fc1"](h), approximate=False))
    return _layer_norm(x, enc["layer_norm"])


@struct.dataclass
class CrossKV:
    k: Array  # [L, B, H, T_enc, hd]
    v: Array


def precompute_cross_kv(params: dict, cfg: WhisperConfig, enc_out: Array) -> CrossKV:
    """Cross-attention K/V are a function of the encoder output only —
    computed once per utterance, reused every decode step."""
    nh, hd = cfg.decoder_attention_heads, cfg.head_dim_
    b = enc_out.shape[0]
    ks, vs = [], []
    for layer in params["decoder"]["layers"]:
        att = layer["encoder_attn"]
        k = att["k_proj"](enc_out).reshape(b, -1, nh, hd).transpose(0, 2, 1, 3)
        v = att["v_proj"](enc_out).reshape(b, -1, nh, hd).transpose(0, 2, 1, 3)
        ks.append(k)
        vs.append(v)
    return CrossKV(k=jnp.stack(ks), v=jnp.stack(vs))


def init_decoder_cache(
    cfg: WhisperConfig, batch: int, max_len: Optional[int] = None, dtype=jnp.float32
) -> KVCache:
    s = max_len or cfg.max_target_positions
    shape = (cfg.decoder_layers, batch, cfg.decoder_attention_heads, s, cfg.head_dim_)
    return KVCache(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype))


def decode(
    params: dict,
    cfg: WhisperConfig,
    tokens: Array,
    cross_kv: CrossKV,
    cache: Optional[KVCache] = None,
    start_pos: int | Array = 0,
) -> Tuple[Array, Optional[KVCache]]:
    """Decoder forward over `tokens` [B, T] given precomputed cross K/V.

    With cache: static self-attn KV cache updated in place at start_pos.
    Returns (logits [B, T, V], cache)."""
    dec = params["decoder"]
    b, t = tokens.shape
    nh, hd = cfg.decoder_attention_heads, cfg.head_dim_
    x = jnp.take(dec["embed_tokens"], tokens, axis=0)
    assert jnp.ndim(start_pos) == 0, "whisper decode uses a scalar start_pos"
    pos = jnp.asarray(start_pos) + jnp.arange(t)
    x = x + jnp.take(dec["embed_positions"], pos, axis=0)[None]

    neg = jnp.finfo(jnp.float32).min
    if cache is None:
        causal = jnp.where(jnp.tril(jnp.ones((t, t), bool)), 0.0, neg)[None, None]
    else:
        key_pos = jnp.arange(cache.max_len)
        pos_bt = (jnp.asarray(start_pos) + jnp.arange(t))[None, :]
        causal = jnp.where(key_pos[None, None, :] <= pos_bt[:, :, None], 0.0, neg)[:, None]

    k_all = cache.k if cache is not None else None
    v_all = cache.v if cache is not None else None
    for i, layer in enumerate(dec["layers"]):
        # self-attention (causal / cached)
        h = _layer_norm(x, layer["self_attn_layer_norm"])
        if cache is None:
            x = x + _mha(layer["self_attn"], nh, h, h, causal)
        else:
            att = layer["self_attn"]
            q = (att["q_proj"](h) * (hd**-0.5)).reshape(b, t, nh, hd).transpose(0, 2, 1, 3)
            k = att["k_proj"](h).reshape(b, t, nh, hd).transpose(0, 2, 1, 3)
            v = att["v_proj"](h).reshape(b, t, nh, hd).transpose(0, 2, 1, 3)
            k_all, v_all = _update_stacked_cache(k_all, v_all, i, k, v, start_pos)
            scores = jnp.einsum("bhtd,bhsd->bhts", q, k_all[i],
                                preferred_element_type=jnp.float32) + causal
            probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
            out = jnp.einsum("bhts,bhsd->bhtd", probs, v_all[i])
            x = x + att["out_proj"](out.transpose(0, 2, 1, 3).reshape(b, t, -1))

        # cross-attention over precomputed encoder K/V
        h = _layer_norm(x, layer["encoder_attn_layer_norm"])
        att = layer["encoder_attn"]
        q = (att["q_proj"](h) * (hd**-0.5)).reshape(b, t, nh, hd).transpose(0, 2, 1, 3)
        scores = jnp.einsum("bhtd,bhsd->bhts", q, cross_kv.k[i],
                            preferred_element_type=jnp.float32)
        probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
        out = jnp.einsum("bhts,bhsd->bhtd", probs, cross_kv.v[i])
        x = x + att["out_proj"](out.transpose(0, 2, 1, 3).reshape(b, t, -1))

        # mlp
        h = _layer_norm(x, layer["final_layer_norm"])
        x = x + layer["fc2"](jax.nn.gelu(layer["fc1"](h), approximate=False))

    x = _layer_norm(x, dec["layer_norm"])
    # proj_out tied to embed_tokens (HF `proj_out.weight`)
    logits = jnp.einsum("btd,vd->btv", x, dec["embed_tokens"],
                        preferred_element_type=jnp.float32)
    new_cache = KVCache(k=k_all, v=v_all) if cache is not None else None
    return logits, new_cache


def forward(
    params: dict, cfg: WhisperConfig, mel: Array, dec_tokens: Array
) -> Array:
    """Teacher-forced encoder-decoder forward (tests / loss)."""
    enc_out = encode(params, cfg, mel)
    cross = precompute_cross_kv(params, cfg, enc_out)
    logits, _ = decode(params, cfg, dec_tokens, cross, cache=None)
    return logits


def params_from_hf_state_dict(state, cfg: WhisperConfig, dtype=jnp.float32) -> dict:
    """Map HF `WhisperForConditionalGeneration` weights onto the pytree."""
    import numpy as np

    def arr(name):
        return jnp.asarray(np.asarray(state[name]), dtype)

    def lin(prefix):
        b = f"{prefix}.bias"
        return Linear(weight=arr(f"{prefix}.weight"),
                      bias=arr(b) if b in state else None)

    def ln(prefix):
        return {"weight": arr(f"{prefix}.weight"), "bias": arr(f"{prefix}.bias")}

    def attn(prefix):
        return {p: lin(f"{prefix}.{p}") for p in ("q_proj", "k_proj", "v_proj", "out_proj")}

    enc_layers = []
    for i in range(cfg.encoder_layers):
        p = f"model.encoder.layers.{i}"
        enc_layers.append({
            "self_attn_layer_norm": ln(f"{p}.self_attn_layer_norm"),
            "self_attn": attn(f"{p}.self_attn"),
            "final_layer_norm": ln(f"{p}.final_layer_norm"),
            "fc1": lin(f"{p}.fc1"),
            "fc2": lin(f"{p}.fc2"),
        })
    dec_layers = []
    for i in range(cfg.decoder_layers):
        p = f"model.decoder.layers.{i}"
        dec_layers.append({
            "self_attn_layer_norm": ln(f"{p}.self_attn_layer_norm"),
            "self_attn": attn(f"{p}.self_attn"),
            "encoder_attn_layer_norm": ln(f"{p}.encoder_attn_layer_norm"),
            "encoder_attn": attn(f"{p}.encoder_attn"),
            "final_layer_norm": ln(f"{p}.final_layer_norm"),
            "fc1": lin(f"{p}.fc1"),
            "fc2": lin(f"{p}.fc2"),
        })
    return {
        "encoder": {
            "conv1": {"weight": arr("model.encoder.conv1.weight"),
                      "bias": arr("model.encoder.conv1.bias")},
            "conv2": {"weight": arr("model.encoder.conv2.weight"),
                      "bias": arr("model.encoder.conv2.bias")},
            "embed_positions": arr("model.encoder.embed_positions.weight"),
            "layers": enc_layers,
            "layer_norm": ln("model.encoder.layer_norm"),
        },
        "decoder": {
            "embed_tokens": arr("model.decoder.embed_tokens.weight"),
            "embed_positions": arr("model.decoder.embed_positions.weight"),
            "layers": dec_layers,
            "layer_norm": ln("model.decoder.layer_norm"),
        },
    }
