# SPDX-License-Identifier: Apache-2.0
"""Llama-class decoder (RMSNorm, RoPE, GQA attention, SwiGLU MLP) in pure
functional JAX.

≙ the reference's architecture wrappers (`/root/reference/hqq/models/hf/llama.py`,
`mistral.py`) — but where the reference patches a torch HF model in place, the
TPU build owns the forward pass: parameters are a pytree whose linear leaves
are `Linear` / `QuantLinear` / `PallasQuantLinear` interchangeably, the whole
step jits, and the KV cache is a static-shape pytree updated with
`dynamic_update_slice` (≙ HF `StaticCache` in
`/root/reference/hqq/utils/generation_hf.py:190-202`).

Weight layout follows the HF checkpoint convention ([out, in] matrices,
half-split RoPE) so HF Llama/Mistral checkpoints load directly.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct
from jax import Array

from ..nn.linear import Linear

__all__ = ["LlamaConfig", "KVCache", "init_params", "forward", "init_cache"]


@dataclass(frozen=True)
class LlamaConfig:
    vocab_size: int = 32000
    hidden_size: int = 4096
    intermediate_size: int = 11008
    num_hidden_layers: int = 32
    num_attention_heads: int = 32
    num_key_value_heads: int = 32
    head_dim: Optional[int] = None
    max_position_embeddings: int = 4096
    rms_norm_eps: float = 1e-5
    rope_theta: float = 10000.0
    tie_word_embeddings: bool = False
    attention_bias: bool = False
    mlp_bias: bool = False
    # Sliding-window attention (Mistral-style); None = full causal.
    sliding_window: Optional[int] = None
    # RoPE scaling, stored as a hashable tuple of sorted (key, value) pairs
    # (configs are frozen/hashable). Supported rope_type: "llama3"
    # (Llama-3.1+ smooth frequency interpolation), "linear". None = no
    # scaling. Use `rope_scaling_dict` to read it.
    rope_scaling: Optional[tuple] = None

    def __post_init__(self):
        if isinstance(self.rope_scaling, dict):
            object.__setattr__(
                self, "rope_scaling", tuple(sorted(self.rope_scaling.items()))
            )
        elif isinstance(self.rope_scaling, list):
            object.__setattr__(
                self, "rope_scaling",
                tuple((k, v) for k, v in self.rope_scaling),
            )

    @property
    def rope_scaling_dict(self) -> Optional[dict]:
        return None if self.rope_scaling is None else dict(self.rope_scaling)

    @property
    def head_dim_(self) -> int:
        return self.head_dim or self.hidden_size // self.num_attention_heads

    @classmethod
    def from_hf(cls, hf: dict) -> "LlamaConfig":
        """Build from a HuggingFace config.json dict (Llama/Mistral-family)."""
        return cls(
            vocab_size=hf["vocab_size"],
            hidden_size=hf["hidden_size"],
            intermediate_size=hf["intermediate_size"],
            num_hidden_layers=hf["num_hidden_layers"],
            num_attention_heads=hf["num_attention_heads"],
            num_key_value_heads=hf.get(
                "num_key_value_heads", hf["num_attention_heads"]
            ),
            head_dim=hf.get("head_dim"),
            max_position_embeddings=hf.get("max_position_embeddings", 4096),
            rms_norm_eps=hf.get("rms_norm_eps", 1e-5),
            rope_theta=hf.get("rope_theta", 10000.0),
            tie_word_embeddings=hf.get("tie_word_embeddings", False),
            attention_bias=hf.get("attention_bias", False),
            mlp_bias=hf.get("mlp_bias", False),
            sliding_window=hf.get("sliding_window"),
            rope_scaling=cls._canon_rope_scaling(hf.get("rope_scaling")),
        )

    @staticmethod
    def _canon_rope_scaling(rs: Optional[dict]) -> Optional[tuple]:
        if not rs:
            return None
        rt = rs.get("rope_type", rs.get("type", "default"))
        if rt in ("default",):
            return None
        assert rt in ("llama3", "linear", "yarn"), (
            f"rope_type {rt!r} not implemented (supported: llama3, linear, yarn)"
        )
        keep = {k: v for k, v in rs.items()
                if k in ("rope_type", "type", "factor", "low_freq_factor",
                         "high_freq_factor", "original_max_position_embeddings",
                         "beta_fast", "beta_slow", "truncate",
                         "attention_factor", "mscale", "mscale_all_dim")}
        keep["rope_type"] = rt
        keep.pop("type", None)
        return tuple(sorted(keep.items()))

    @classmethod
    def llama2_7b(cls) -> "LlamaConfig":
        return cls()

    @classmethod
    def llama2_13b(cls) -> "LlamaConfig":
        return cls(
            hidden_size=5120,
            intermediate_size=13824,
            num_hidden_layers=40,
            num_attention_heads=40,
            num_key_value_heads=40,
        )

    @classmethod
    def llama2_70b(cls) -> "LlamaConfig":
        """BASELINE's scale-out geometry: GQA 64q/8kv, ffn 28672, 80 layers
        (tensor-sharded w4a8 serving target — see `utils/memory.py` for the
        per-chip fit arithmetic)."""
        return cls(
            hidden_size=8192,
            intermediate_size=28672,
            num_hidden_layers=80,
            num_attention_heads=64,
            num_key_value_heads=8,
        )

    @classmethod
    def llama3_8b(cls) -> "LlamaConfig":
        return cls(
            vocab_size=128256,
            intermediate_size=14336,
            num_key_value_heads=8,
            rope_theta=500000.0,
            max_position_embeddings=8192,
        )

    @classmethod
    def tiny(cls, vocab_size: int = 256) -> "LlamaConfig":
        """2-layer truncated model for tests (≙ the reference test fixture,
        `/root/reference/tests/test_quantize.py:185-203`)."""
        return cls(
            vocab_size=vocab_size,
            hidden_size=256,
            intermediate_size=512,
            num_hidden_layers=2,
            num_attention_heads=4,
            num_key_value_heads=2,
            max_position_embeddings=512,
        )


# The model's quantizable linear tags, 1:1 with the reference's
# (`/root/reference/hqq/models/hf/llama.py:11-21`). lm_head is excluded
# (`models/base.py:43` _IGNORE_LINEAR).
LINEAR_TAGS = (
    "self_attn.q_proj",
    "self_attn.k_proj",
    "self_attn.v_proj",
    "self_attn.o_proj",
    "mlp.gate_proj",
    "mlp.up_proj",
    "mlp.down_proj",
)


def init_params(cfg: LlamaConfig, key: Array, dtype=jnp.bfloat16) -> dict:
    """Random-init parameter pytree in HF naming (for tests/benchmarks)."""
    k_iter = iter(jax.random.split(key, 4 + 7 * cfg.num_hidden_layers))
    d, f = cfg.hidden_size, cfg.intermediate_size
    nh, nkv, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim_

    def lin(out_f, in_f):
        w = jax.random.normal(next(k_iter), (out_f, in_f), jnp.float32)
        return Linear(weight=(w / jnp.sqrt(in_f)).astype(dtype))

    layers = []
    for _ in range(cfg.num_hidden_layers):
        layers.append(
            {
                "self_attn": {
                    "q_proj": lin(nh * hd, d),
                    "k_proj": lin(nkv * hd, d),
                    "v_proj": lin(nkv * hd, d),
                    "o_proj": lin(d, nh * hd),
                },
                "mlp": {
                    "gate_proj": lin(f, d),
                    "up_proj": lin(f, d),
                    "down_proj": lin(d, f),
                },
                "input_layernorm": jnp.ones((d,), dtype),
                "post_attention_layernorm": jnp.ones((d,), dtype),
            }
        )
    embed = (
        jax.random.normal(next(k_iter), (cfg.vocab_size, d), jnp.float32) * 0.02
    ).astype(dtype)
    params = {
        "embed_tokens": embed,
        "layers": layers,
        "norm": jnp.ones((d,), dtype),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = lin(cfg.vocab_size, d)
    return params


@struct.dataclass
class KVCache:
    """Static-shape KV cache: k/v are [L, B, n_kv, S_max, head_dim].

    With `quantized` (k_scales set) the pools are int8 with per-row absmax
    scales [L, B, n_kv, S_max, 1] — half the KV bytes per decode step (KV
    reads are ~35% of a batch-8 7B step's HBM traffic), same scheme as the
    paged pool's int8 pages (ops/paged.py)."""

    k: Array
    v: Array
    k_scales: Optional[Array] = None
    v_scales: Optional[Array] = None

    @property
    def max_len(self) -> int:
        return self.k.shape[3]

    @property
    def quantized(self) -> bool:
        return self.k_scales is not None


def init_cache(
    cfg: LlamaConfig, batch: int, max_len: int, dtype=jnp.bfloat16,
    quantize_kv: bool = False,
) -> KVCache:
    shape = (
        cfg.num_hidden_layers,
        batch,
        cfg.num_key_value_heads,
        max_len,
        cfg.head_dim_,
    )
    if quantize_kv:
        sshape = shape[:-1] + (1,)
        return KVCache(
            k=jnp.zeros(shape, jnp.int8), v=jnp.zeros(shape, jnp.int8),
            k_scales=jnp.ones(sshape, jnp.float32),
            v_scales=jnp.ones(sshape, jnp.float32),
        )
    return KVCache(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype))


def rms_norm(x: Array, w: Array, eps: float) -> Array:
    dt = x.dtype
    x = x.astype(jnp.float32)
    x = x * jax.lax.rsqrt(jnp.mean(x * x, axis=-1, keepdims=True) + eps)
    return (x * w.astype(jnp.float32)).astype(dt)


def _rope_params(head_dim: int, theta: float, scaling: Optional[tuple]):
    """(inverse frequencies [hd/2], attention factor) with optional scaling.

    "llama3": Llama-3.1 smooth interpolation (≙ HF
    `_compute_llama3_parameters`): low-frequency components divide by
    `factor`, high-frequency components pass through, the band between
    interpolates smoothly. "linear": divide everything by `factor`.
    "yarn": NTK-by-parts interpolation with a linear ramp between the
    beta_fast/beta_slow correction dims plus the paper's attention scaling
    of cos/sin (≙ HF `_compute_yarn_parameters`; gpt-oss ships this)."""
    import math

    inv_freq = 1.0 / (
        theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim)
    )
    if scaling is None:
        return inv_freq, 1.0
    rs = dict(scaling)
    factor = float(rs.get("factor", 1.0))
    rt = rs.get("rope_type")
    if rt == "linear":
        return inv_freq / factor, 1.0
    if rt == "llama3":
        low = float(rs.get("low_freq_factor", 1.0))
        high = float(rs.get("high_freq_factor", 4.0))
        old_ctx = float(rs.get("original_max_position_embeddings", 8192))
        wavelen = 2.0 * jnp.pi / inv_freq
        low_wl = old_ctx / low
        high_wl = old_ctx / high
        scaled = jnp.where(wavelen > low_wl, inv_freq / factor, inv_freq)
        smooth = (old_ctx / wavelen - low) / (high - low)
        smoothed = (1.0 - smooth) * scaled / factor + smooth * scaled
        is_medium = (wavelen >= high_wl) & (wavelen <= low_wl)
        return jnp.where(is_medium, smoothed, scaled), 1.0
    # yarn
    beta_fast = float(rs.get("beta_fast") or 32)
    beta_slow = float(rs.get("beta_slow") or 1)
    old_ctx = float(rs.get("original_max_position_embeddings", 4096))
    truncate = bool(rs.get("truncate", True))
    att = rs.get("attention_factor")
    if att is None:
        mscale, mscale_all = rs.get("mscale"), rs.get("mscale_all_dim")

        def get_mscale(scale, m=1.0):
            return 1.0 if scale <= 1 else 0.1 * m * math.log(scale) + 1.0

        if mscale and mscale_all:
            att = get_mscale(factor, mscale) / get_mscale(factor, mscale_all)
        else:
            att = get_mscale(factor)

    def corr_dim(n_rot):
        return (head_dim * math.log(old_ctx / (n_rot * 2 * math.pi))) / (
            2 * math.log(theta)
        )

    low = corr_dim(beta_fast)
    high = corr_dim(beta_slow)
    if truncate:
        low, high = math.floor(low), math.ceil(high)
    low, high = max(low, 0), min(high, head_dim - 1)
    if low == high:
        high += 0.001
    ramp = jnp.clip(
        (jnp.arange(head_dim // 2, dtype=jnp.float32) - low) / (high - low), 0, 1
    )
    extrapolation_factor = 1.0 - ramp
    inv = inv_freq / factor * (1 - extrapolation_factor) + inv_freq * extrapolation_factor
    return inv, float(att)


def _rope_cos_sin(
    positions: Array, head_dim: int, theta: float,
    scaling: Optional[tuple] = None,
) -> Tuple[Array, Array]:
    """HF-convention rotary tables: [T, head_dim] with duplicated halves."""
    inv_freq, att = _rope_params(head_dim, theta, scaling)
    freqs = positions.astype(jnp.float32)[:, None] * inv_freq[None, :]  # [T, hd/2]
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb) * att, jnp.sin(emb) * att


def _apply_rope(x: Array, cos: Array, sin: Array) -> Array:
    """x: [B, H, T, hd]; HF 'rotate_half' convention."""
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    return (x.astype(jnp.float32) * cos + rotated.astype(jnp.float32) * sin).astype(
        x.dtype
    )


def positions_and_masks(
    cfg: LlamaConfig,
    t: int,
    start_pos: int | Array,
    cache_max_len: Optional[int],
    kv_valid: Optional[Array] = None,
):
    """Shared position / RoPE-table / attention-mask construction.

    `start_pos` may be a scalar (whole batch at the same offset) or a [B]
    vector (continuous batching: every slot at its own decode offset).
    Returns (positions, cos, sin, mask).
    """
    pos_arr = jnp.asarray(start_pos)
    if pos_arr.ndim == 0:
        positions = pos_arr + jnp.arange(t)  # [T]
        pos_bt = positions[None, :]  # [1, T]
    else:
        positions = pos_arr[:, None] + jnp.arange(t)[None, :]  # [B, T]
        pos_bt = positions
    cos, sin = _rope_cos_sin(
        pos_bt.reshape(-1), cfg.head_dim_, cfg.rope_theta,
        getattr(cfg, "rope_scaling", None),
    )
    cos = cos.reshape(*pos_bt.shape, cfg.head_dim_)[:, None]  # [B|1, 1, T, hd]
    sin = sin.reshape(*pos_bt.shape, cfg.head_dim_)[:, None]

    neg = jnp.finfo(jnp.float32).min
    window = getattr(cfg, "sliding_window", None)
    if cache_max_len is None:
        visible_tt = jnp.tril(jnp.ones((t, t), bool))
        if window is not None:
            qp = jnp.arange(t)
            visible_tt &= (qp[:, None] - qp[None, :]) < window
        mask = jnp.where(visible_tt, 0.0, neg)[None, None]
    else:
        key_pos = jnp.arange(cache_max_len)
        visible = key_pos[None, None, :] <= pos_bt[:, :, None]  # [B|1, T, S]
        if window is not None:
            visible &= (pos_bt[:, :, None] - key_pos[None, None, :]) < window
        mask = jnp.where(visible, 0.0, neg)[:, None]  # [B|1, 1, T, S]
        if kv_valid is not None:
            mask = mask + jnp.where(kv_valid, 0.0, neg)[:, None, None, :]
    return positions, cos, sin, mask


def _update_stacked_cache(
    k_all: Array, v_all: Array, layer_idx: int, k: Array, v: Array, start_pos
) -> Tuple[Array, Array]:
    """Write new K/V [B, n_kv, t, hd] into the STACKED cache [L, B, n_kv, S, hd]
    at layer `layer_idx`, sequence offset `start_pos` — pure
    `dynamic_update_slice` on the scan-carried arrays, so XLA updates the
    cache in place (slicing per layer + re-stacking would copy the whole
    cache every decode step: ~1 GB/token on a 7B model at 1k context)."""
    pos_arr = jnp.asarray(start_pos)
    if pos_arr.ndim == 0:
        k_all = jax.lax.dynamic_update_slice(k_all, k[None], (layer_idx, 0, 0, pos_arr, 0))
        v_all = jax.lax.dynamic_update_slice(v_all, v[None], (layer_idx, 0, 0, pos_arr, 0))
    else:
        # Per-slot offsets (continuous batching): ONE scatter per pool for
        # ALL (slot, token) pairs (vs B·t tiny updates — thousands of ops per
        # step at 8 slots × 32 layers, and t scatters per layer on the
        # horizon/speculative multi-token paths).
        b, t = k.shape[0], k.shape[2]
        bidx = jnp.arange(b)[:, None]  # [B, 1]
        tpos = pos_arr[:, None] + jnp.arange(t)[None, :]  # [B, t]
        # advanced indices (bidx, tpos) are separated by the head slice, so
        # the indexed dims move to the front: value layout [B, t, n_kv, hd]
        k_all = k_all.at[layer_idx, bidx, :, tpos].set(k.transpose(0, 2, 1, 3))
        v_all = v_all.at[layer_idx, bidx, :, tpos].set(v.transpose(0, 2, 1, 3))
    return k_all, v_all


def _attention_nocache(
    layer: dict,
    cfg: LlamaConfig,
    x: Array,
    mask: Optional[Array],
    cos: Array,
    sin: Array,
) -> Array:
    """Full-sequence attention (training / PPL eval): flash kernel on TPU for
    long pure-causal sequences, naive path otherwise (see ops/attention.py)."""
    from ..ops.attention import prefill_attention

    b, t, d = x.shape
    nh, nkv, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim_

    if "qkv_proj" in layer:
        qkv = layer["qkv_proj"](x)
        q, k, v = jnp.split(qkv, [nh * hd, (nh + nkv) * hd], axis=-1)
    else:
        q, k, v = layer["q_proj"](x), layer["k_proj"](x), layer["v_proj"](x)
    q = q.reshape(b, t, nh, hd).transpose(0, 2, 1, 3)
    k = k.reshape(b, t, nkv, hd).transpose(0, 2, 1, 3)
    v = v.reshape(b, t, nkv, hd).transpose(0, 2, 1, 3)
    if "q_norm" in layer:
        q = rms_norm(q, layer["q_norm"], cfg.rms_norm_eps)
        k = rms_norm(k, layer["k_norm"], cfg.rms_norm_eps)
    q = _apply_rope(q, cos, sin)
    k = _apply_rope(k, cos, sin)

    rep = nh // nkv
    if rep > 1:
        k = jnp.repeat(k, rep, axis=1)
        v = jnp.repeat(v, rep, axis=1)

    # pure causal -> flash-eligible (mask baked into the kernel); sliding
    # window / explicit masks use the naive path
    flash_ok = getattr(cfg, "sliding_window", None) is None
    out = prefill_attention(
        q, k, v, causal=True, mask=None if flash_ok else mask, scale=hd**-0.5
    )
    out = out.transpose(0, 2, 1, 3).reshape(b, t, nh * hd)
    return layer["o_proj"](out)


def _attention(
    layer: dict,
    cfg: LlamaConfig,
    x: Array,
    k_all: Array,
    v_all: Array,
    layer_idx: int,
    start_pos: int | Array,
    mask: Array,
    cos: Array,
    sin: Array,
    ks_all: Optional[Array] = None,
    vs_all: Optional[Array] = None,
) -> Tuple[Array, ...]:
    """Attention over the stacked cache; returns (out, k_all, v_all) with the
    layer's new K/V written in place.

    With `ks_all`/`vs_all` given the pools are int8 with per-row scales (see
    `KVCache.quantized`): new rows are absmax-quantized before the write, the
    layer's window is dequantized on read (XLA fuses gather+scale+cast — the
    HBM bytes are the int8 codes), and the return is the 5-tuple
    (out, k_all, v_all, ks_all, vs_all)."""
    b, t, d = x.shape
    nh, nkv, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim_

    if "qkv_proj" in layer:
        # decode-fused projection (one wide matmul; see utils/patching.fuse
        # — int8 MXU efficiency grows with N)
        qkv = layer["qkv_proj"](x)
        q, k, v = jnp.split(qkv, [nh * hd, (nh + nkv) * hd], axis=-1)
    else:
        q, k, v = layer["q_proj"](x), layer["k_proj"](x), layer["v_proj"](x)
    q = q.reshape(b, t, nh, hd).transpose(0, 2, 1, 3)
    k = k.reshape(b, t, nkv, hd).transpose(0, 2, 1, 3)
    v = v.reshape(b, t, nkv, hd).transpose(0, 2, 1, 3)

    if "q_norm" in layer:  # Qwen3-style per-head q/k RMSNorm (pre-RoPE)
        q = rms_norm(q, layer["q_norm"], cfg.rms_norm_eps)
        k = rms_norm(k, layer["k_norm"], cfg.rms_norm_eps)

    q = _apply_rope(q, cos, sin)
    k = _apply_rope(k, cos, sin)

    rep = nh // nkv
    if ks_all is not None:
        from ..ops.paged import quant_rows

        kq, ks = quant_rows(k)
        vq, vs = quant_rows(v)
        k_all, v_all = _update_stacked_cache(k_all, v_all, layer_idx, kq, vq, start_pos)
        ks_all, vs_all = _update_stacked_cache(
            ks_all, vs_all, layer_idx, ks, vs, start_pos
        )
        # scale-after-dot: per-row K scales multiply score COLUMNS and V
        # scales fold into the probs — same math as dequantize-then-attend,
        # reordered so no dequantized [H, S, hd] window is materialized
        # (measured: dequant-first costs ~16% at batch 8, this is neutral)
        keys, vals = k_all[layer_idx], v_all[layer_idx]
        ksl = ks_all[layer_idx][..., 0] / 127.0  # [B, nkv, S]
        vsl = vs_all[layer_idx][..., 0] / 127.0
        if rep > 1:
            keys, vals = jnp.repeat(keys, rep, 1), jnp.repeat(vals, rep, 1)
            ksl, vsl = jnp.repeat(ksl, rep, 1), jnp.repeat(vsl, rep, 1)
        scores = jnp.einsum(
            "bhtd,bhsd->bhts", q, keys.astype(q.dtype),
            preferred_element_type=jnp.float32,
        ) * (ksl[:, :, None, :] / jnp.sqrt(hd).astype(jnp.float32))
        probs = jax.nn.softmax((scores + mask).astype(jnp.float32), axis=-1)
        probs = (probs * vsl[:, :, None, :]).astype(q.dtype)
        out = jnp.einsum("bhts,bhsd->bhtd", probs, vals.astype(q.dtype))
        out = out.transpose(0, 2, 1, 3).reshape(b, t, nh * hd).astype(x.dtype)
        return layer["o_proj"](out), k_all, v_all, ks_all, vs_all

    k_all, v_all = _update_stacked_cache(k_all, v_all, layer_idx, k, v, start_pos)
    keys, vals = k_all[layer_idx], v_all[layer_idx]

    # GQA: expand kv heads to query heads.
    keys = jnp.repeat(keys, rep, axis=1) if rep > 1 else keys
    vals = jnp.repeat(vals, rep, axis=1) if rep > 1 else vals

    scores = jnp.einsum(
        "bhtd,bhsd->bhts", q, keys, preferred_element_type=jnp.float32
    ) / jnp.sqrt(hd).astype(jnp.float32)
    scores = scores + mask  # [1/b, 1, t, S_max]
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
    out = jnp.einsum("bhts,bhsd->bhtd", probs, vals)
    out = out.transpose(0, 2, 1, 3).reshape(b, t, nh * hd)
    return layer["o_proj"](out), k_all, v_all


def _attention_paged(
    layer: dict,
    cfg: LlamaConfig,
    x: Array,  # [B, T, D] (T=1 decode; T=k speculative verify window)
    cache,  # ops.paged.PagedKVCache
    layer_idx: int,
    lengths: Array,  # [B] current sequence length (pos of the first new token)
    page_indices: Array,  # [B, MP]
    cos: Array,
    sin: Array,
    window: "int | None" = None,
    q_scale: "float | None" = None,
    seq_axis: "str | None" = None,
):
    """Attention over a paged pool: same projections / q-k norms / RoPE as
    `_attention`, but K/V land in pages and attention runs the paged kernel
    (see ops/paged.py). T>1 supports the speculative-verify window: all T
    rows are written first, then query j attends keys < lengths+j+1 —
    exactly history + candidates 0..j (causal). `q_scale` overrides the
    1/sqrt(hd) query scaling (granite's attention_multiplier).
    `seq_axis` (inside shard_map, pool page-sharded over it): writes land
    only on the owning shard and attention runs the sequence-parallel merge.
    Returns (out, cache)."""
    from ..ops.paged import paged_attn, write_token_to_pages

    b, t, d = x.shape
    nh, nkv, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim_
    pg = cache.page_size

    if "qkv_proj" in layer:
        qkv = layer["qkv_proj"](x)
        q, k, v = jnp.split(qkv, [nh * hd, (nh + nkv) * hd], axis=-1)
    else:
        q, k, v = layer["q_proj"](x), layer["k_proj"](x), layer["v_proj"](x)
    q = q.reshape(b, t, nh, hd).transpose(0, 2, 1, 3)
    k = k.reshape(b, t, nkv, hd).transpose(0, 2, 1, 3)
    v = v.reshape(b, t, nkv, hd).transpose(0, 2, 1, 3)
    if "q_norm" in layer:
        q = rms_norm(q, layer["q_norm"], cfg.rms_norm_eps)
        k = rms_norm(k, layer["k_norm"], cfg.rms_norm_eps)
    q = _apply_rope(q, cos, sin)
    k = _apply_rope(k, cos, sin)

    pos_bt = lengths[:, None] + jnp.arange(t)[None, :]  # [B, T]
    page_of = jnp.take_along_axis(page_indices, pos_bt // pg, axis=1)
    offset = pos_bt % pg
    if seq_axis is not None:
        # pool is page-sharded over seq_axis in contiguous blocks: convert to
        # LOCAL page ids; non-owned rows get an OOB sentinel and are dropped
        rank = jax.lax.axis_index(seq_axis)
        p_local = cache.k.shape[2]
        lidx = page_of - rank * p_local
        owned = (lidx >= 0) & (lidx < p_local)
        page_of = jnp.where(owned, lidx, p_local)
    # one flattened [B*T]-row scatter per pool (see write_token_to_pages)
    kw = k.transpose(0, 2, 1, 3).reshape(b * t, nkv, hd)
    vw = v.transpose(0, 2, 1, 3).reshape(b * t, nkv, hd)
    cache = write_token_to_pages(
        cache, layer_idx, kw, vw, page_of.reshape(-1), offset.reshape(-1),
        drop_oob=seq_axis is not None,
    )
    qdt = jnp.float32 if cache.quantized else cache.k.dtype
    scale = (hd**-0.5) if q_scale is None else q_scale
    qd = (q * scale).astype(qdt)  # [B, nh, T, hd]
    attn = jnp.stack(
        [
            paged_attn(
                qd[:, :, j], cache, layer_idx, lengths + j + 1, page_indices,
                window=window, seq_axis=seq_axis,
            )
            for j in range(t)
        ],
        axis=1,
    )  # [B, T, nh, hd]
    out = attn.reshape(b, t, nh * hd).astype(x.dtype)
    return layer["o_proj"](out), cache


def _forward_paged(
    params: dict,
    cfg: LlamaConfig,
    tokens: Array,  # [B] or [B, 1]
    cache,
    lengths: Array,  # [B]
    page_indices: Array,
    mlp_fn=None,  # (layer_dict, x) -> x; MoE families inject their block
    seq_axis: "str | None" = None,
) -> Tuple[Array, Any]:
    """One paged step for all slots (t=1 decode; t=k speculative verify).
    Shares every architectural detail with the dense `forward` — this is the
    cache-polymorphic branch. `mlp_fn` lets llama-attention MoE families
    (mixtral) reuse this whole walk instead of duplicating it."""
    if mlp_fn is None:
        mlp_fn = lambda layer, h: _mlp(layer["mlp"], h)  # noqa: E731
    toks = tokens if tokens.ndim == 2 else tokens[:, None]
    b, t = toks.shape
    x = jnp.take(params["embed_tokens"], toks, axis=0)  # [B, T, D]
    _, cos, sin, _ = positions_and_masks(cfg, t, lengths, None)

    for i, layer in enumerate(params["layers"]):
        h = rms_norm(x, layer["input_layernorm"], cfg.rms_norm_eps)
        attn_out, cache = _attention_paged(
            layer["self_attn"], cfg, h, cache, i, lengths, page_indices,
            cos, sin, window=getattr(cfg, "sliding_window", None),
            seq_axis=seq_axis,
        )
        x = x + attn_out
        h = rms_norm(x, layer["post_attention_layernorm"], cfg.rms_norm_eps)
        x = x + mlp_fn(layer, h)

    x = rms_norm(x, params["norm"], cfg.rms_norm_eps)
    if cfg.tie_word_embeddings or "lm_head" not in params:
        logits = jnp.einsum("btd,vd->btv", x, params["embed_tokens"],
                            preferred_element_type=jnp.float32)
    else:
        logits = params["lm_head"](x).astype(jnp.float32)
    return logits, cache


def _mlp(layer: dict, x: Array) -> Array:
    if "gate_up_proj" in layer:
        gu = layer["gate_up_proj"](x)
        gate, up = jnp.split(gu, 2, axis=-1)
        return layer["down_proj"](jax.nn.silu(gate) * up)
    return layer["down_proj"](jax.nn.silu(layer["gate_proj"](x)) * layer["up_proj"](x))


def forward(
    params: dict,
    cfg: LlamaConfig,
    tokens: Optional[Array],
    cache: Optional[KVCache] = None,
    start_pos: int | Array = 0,
    kv_valid: Optional[Array] = None,
    inputs_embeds: Optional[Array] = None,
    page_indices: Optional[Array] = None,
    seq_axis: Optional[str] = None,
) -> Tuple[Array, Optional[KVCache]]:
    """Run the model over `tokens` [B, T] starting at `start_pos`.

    Returns (logits [B, T, V], updated cache). With cache=None a causal
    mask over T is used and no cache is produced (training / PPL eval mode).
    `kv_valid` [B, S_max] optionally masks cache slots (left-padded batches).
    `inputs_embeds` [B, T, D] bypasses the token embedding (multimodal
    prefixes, ≙ HF inputs_embeds — see examples/vlm_demo.py).

    Cache polymorphism: when `cache` is a `PagedKVCache` (with
    `page_indices` [B, MP] given), this runs ONE paged decode step per slot
    at offsets `start_pos` [B] — the serving engine's hot path.
    """
    from ..ops.paged import PagedKVCache

    if isinstance(cache, PagedKVCache):
        return _forward_paged(
            params, cfg, tokens, cache, jnp.asarray(start_pos), page_indices,
            seq_axis=seq_axis,
        )
    if inputs_embeds is not None:
        x = inputs_embeds
        b, t = x.shape[:2]
    else:
        b, t = tokens.shape
        x = jnp.take(params["embed_tokens"], tokens, axis=0)

    _, cos, sin, mask = positions_and_masks(
        cfg, t, start_pos, None if cache is None else cache.max_len, kv_valid
    )

    if cache is not None:
        k_all, v_all = cache.k, cache.v
        ks_all, vs_all = cache.k_scales, cache.v_scales
    else:
        # self-contained attention over the current window (single-"layer"
        # scratch cache reused per block)
        k_all = v_all = ks_all = vs_all = None

    for i, layer in enumerate(params["layers"]):
        h = rms_norm(x, layer["input_layernorm"], cfg.rms_norm_eps)
        if cache is None:
            attn_out = _attention_nocache(layer["self_attn"], cfg, h, mask, cos, sin)
        elif ks_all is not None:
            attn_out, k_all, v_all, ks_all, vs_all = _attention(
                layer["self_attn"], cfg, h, k_all, v_all, i, start_pos,
                mask, cos, sin, ks_all, vs_all,
            )
        else:
            attn_out, k_all, v_all = _attention(
                layer["self_attn"], cfg, h, k_all, v_all, i, start_pos,
                mask, cos, sin,
            )
        x = x + attn_out
        h = rms_norm(x, layer["post_attention_layernorm"], cfg.rms_norm_eps)
        x = x + _mlp(layer["mlp"], h)

    x = rms_norm(x, params["norm"], cfg.rms_norm_eps)
    if cfg.tie_word_embeddings or "lm_head" not in params:
        logits = jnp.einsum(
            "btd,vd->btv", x, params["embed_tokens"], preferred_element_type=jnp.float32
        )
    else:
        logits = params["lm_head"](x).astype(jnp.float32)

    new_cache = (
        KVCache(k=k_all, v=v_all, k_scales=ks_all, v_scales=vs_all)
        if cache is not None else None
    )
    return logits, new_cache
