# SPDX-License-Identifier: Apache-2.0
"""Qwen2-VL: vision tower (2D-RoPE ViT + patch merger) and a Qwen2 text
model with M-RoPE (multimodal 3D rotary embedding).

The reference serves Qwen2-VL through vLLM + AutoProcessor
(`/root/reference/examples/vllm_qwenvl.py`, `examples/models/qwen_vl.py`);
here both towers are functional pytrees quantized with the same
`quantize_model` machinery as every other family (≙ HF `qwen2_vl`
`modeling_qwen2_vl.py`: `Qwen2VisionTransformerPretrainedModel` +
`Qwen2VLTextModel`).

Architecture notes (vs plain llama/qwen2):

* Vision tower: patches are `[N, C·tp·p·p]` rows (the HF Conv3d patch embed
  is stride==kernel, i.e. a plain matmul over flattened patches — MXU-
  friendly). Each block is pre-LN attention + quick-GELU MLP; attention is
  full (non-causal) within each image, block-diagonal across images; q/k get
  2D rotary embeddings (head_dim/2 split half height, half width, positions
  permuted into spatial_merge_size groups). A final PatchMerger layer-norms
  and concatenates each 2×2 spatial group, then projects to the text width.
* Text tower: Qwen2 (llama walk + attention biases) where cos/sin come from
  THREE position-id streams (temporal, height, width): the head_dim is split
  into `mrope_section` chunks, chunk i using stream i%3 (≙ HF
  `apply_multimodal_rotary_pos_emb`). Text-only tokens carry identical
  t/h/w positions, which reduces to standard RoPE.
"""

from __future__ import annotations

import dataclasses
import math
from dataclasses import dataclass
from typing import Any, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import Array

from ..nn.linear import Linear
from . import llama
from .llama import KVCache, init_cache, rms_norm  # noqa: F401 (re-export)
from .vit import _layer_norm

__all__ = [
    "VisionConfig",
    "Qwen2VLConfig",
    "init_params",
    "vision_forward",
    "forward",
    "get_mrope_positions",
    "params_from_hf_state_dict",
]


# --------------------------------------------------------------------------
# configs
# --------------------------------------------------------------------------


@dataclass(frozen=True)
class VisionConfig:
    depth: int = 32
    embed_dim: int = 1280
    hidden_size: int = 3584  # text width the merger projects into
    num_heads: int = 16
    in_channels: int = 3
    patch_size: int = 14
    spatial_merge_size: int = 2
    temporal_patch_size: int = 2
    mlp_ratio: int = 4

    @property
    def head_dim(self) -> int:
        return self.embed_dim // self.num_heads

    @property
    def patch_dim(self) -> int:
        return self.in_channels * self.temporal_patch_size * self.patch_size ** 2

    @classmethod
    def from_hf(cls, hf: dict) -> "VisionConfig":
        return cls(
            depth=hf.get("depth", 32),
            embed_dim=hf.get("embed_dim", 1280),
            hidden_size=hf.get("hidden_size", 3584),
            num_heads=hf.get("num_heads", 16),
            in_channels=hf.get("in_channels", 3),
            patch_size=hf.get("patch_size", 14),
            spatial_merge_size=hf.get("spatial_merge_size", 2),
            temporal_patch_size=hf.get("temporal_patch_size", 2),
            mlp_ratio=hf.get("mlp_ratio", 4),
        )


@dataclass(frozen=True)
class Qwen2VLConfig:
    text: llama.LlamaConfig
    vision: VisionConfig
    mrope_section: Tuple[int, ...] = (16, 24, 24)
    image_token_id: int = 151655
    video_token_id: int = 151656
    vision_start_token_id: int = 151652

    @classmethod
    def from_hf(cls, hf: dict) -> "Qwen2VLConfig":
        tc = dict(hf.get("text_config", hf))
        # mrope lives in rope_scaling; it is NOT an inv_freq transform, so
        # strip it before the llama config canonicalization
        rs = tc.get("rope_scaling") or {}
        section = tuple(rs.get("mrope_section", (16, 24, 24)))
        tc = dict(tc, rope_scaling=None, attention_bias=True)
        return cls(
            text=llama.LlamaConfig.from_hf(tc),
            vision=VisionConfig.from_hf(hf.get("vision_config", {})),
            mrope_section=section,
            image_token_id=hf.get("image_token_id", 151655),
            video_token_id=hf.get("video_token_id", 151656),
            vision_start_token_id=hf.get("vision_start_token_id", 151652),
        )

    @classmethod
    def tiny(cls, vocab_size: int = 256) -> "Qwen2VLConfig":
        """Test-scale instance (vision token ids inside the tiny vocab)."""
        return cls(
            text=llama.LlamaConfig.tiny(vocab_size=vocab_size),
            vision=VisionConfig(depth=2, embed_dim=64, hidden_size=256,
                                num_heads=4, patch_size=4, mlp_ratio=2),
            mrope_section=(16, 8, 8),
            image_token_id=vocab_size - 2,
            video_token_id=vocab_size - 3,
            vision_start_token_id=vocab_size - 4,
        )


def init_params(cfg: Qwen2VLConfig, key: Array, dtype=jnp.bfloat16) -> dict:
    """Random {"text", "vision"} param trees with real-checkpoint structure
    (a real checkpoint loads through `params_from_hf_state_dict`)."""
    vc = cfg.vision
    e = vc.embed_dim
    keys = iter(jax.random.split(key, 8 + 6 * vc.depth))

    def lin(o, i, bias=True):
        return Linear(
            weight=jax.random.normal(next(keys), (o, i), dtype) * 0.05,
            bias=jnp.zeros((o,), dtype) if bias else None,
        )

    def ln(d):
        return {"weight": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)}

    vision = {
        "patch_embed": Linear(
            weight=jax.random.normal(next(keys), (e, vc.patch_dim), dtype) * 0.05
        ),
        "blocks": [
            {
                "norm1": ln(e),
                "attn_qkv": lin(3 * e, e),
                "attn_proj": lin(e, e),
                "norm2": ln(e),
                "fc1": lin(e * vc.mlp_ratio, e),
                "fc2": lin(e, e * vc.mlp_ratio),
            }
            for _ in range(vc.depth)
        ],
        "merger_ln_q": ln(e),
        "merger_fc1": lin(4 * e, 4 * e),
        "merger_fc2": lin(vc.hidden_size, 4 * e),
    }
    text = llama.init_params(cfg.text, next(keys), dtype)
    return {"text": text, "vision": vision}


# --------------------------------------------------------------------------
# vision tower
# --------------------------------------------------------------------------


def _vision_rope_tables(cfg: VisionConfig, grid_thw) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side 2D rotary tables [N, head_dim] for static `grid_thw`
    (tuple of (t, h, w) per image). Positions are permuted into
    spatial_merge_size×spatial_merge_size groups — the same patch order the
    merger consumes (≙ HF `rot_pos_emb`, modeling_qwen2_vl.py:673)."""
    m = cfg.spatial_merge_size
    hd = cfg.head_dim
    pos = []
    for t, h, w in grid_thw:
        hp = np.arange(h)[:, None].repeat(w, 1)
        wp = np.arange(w)[None, :].repeat(h, 0)
        perm = lambda a: a.reshape(h // m, m, w // m, m).transpose(0, 2, 1, 3).reshape(-1)  # noqa: E731
        hw = np.stack([perm(hp), perm(wp)], axis=-1)  # [h*w, 2]
        pos.append(np.tile(hw, (t, 1)))
    pos = np.concatenate(pos, axis=0)  # [N, 2]
    inv = 1.0 / (10000.0 ** (np.arange(0, hd // 2, 2, dtype=np.float32) / (hd // 2)))
    freqs = pos[..., None].astype(np.float32) * inv  # [N, 2, hd/4]
    freqs = freqs.reshape(len(pos), -1)  # [N, hd/2]
    emb = np.concatenate([freqs, freqs], axis=-1)  # [N, hd]
    return np.cos(emb), np.sin(emb)


def _segment_mask(grid_thw) -> np.ndarray:
    """Block-diagonal attention mask (0 / -inf) across images; within an
    image every frame's patches attend each other (per-frame segments, ≙ HF
    cu_seqlens = repeat(h*w, t).cumsum)."""
    seg = np.concatenate(
        [np.full(h * w, 1000 * i + f) for i, (t, h, w) in enumerate(grid_thw)
         for f in range(t)]
    )
    allow = seg[:, None] == seg[None, :]
    return np.where(allow, 0.0, np.finfo(np.float32).min).astype(np.float32)


def _rotate_half(x: Array) -> Array:
    a, b = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-b, a], axis=-1)


def quick_gelu(x: Array) -> Array:
    return x * jax.nn.sigmoid(1.702 * x)


def vision_forward(params: dict, cfg: VisionConfig, patches: Array, grid_thw) -> Array:
    """Run the vision tower over flattened patches [N, C·tp·p·p].

    `grid_thw` is a STATIC tuple of (t, h, w) per image (N = Σ t·h·w).
    Returns merged embeddings [N / spatial_merge_size², hidden_size]."""
    nh, hd = cfg.num_heads, cfg.head_dim
    n = patches.shape[0]
    x = params["patch_embed"](patches)  # [N, E]

    cos_np, sin_np = _vision_rope_tables(cfg, grid_thw)
    cos = jnp.asarray(cos_np)[None]  # [1, N, hd] (broadcast over heads)
    sin = jnp.asarray(sin_np)[None]
    mask = jnp.asarray(_segment_mask(grid_thw))

    for blk in params["blocks"]:
        h = _layer_norm(x, blk["norm1"], 1e-6)
        qkv = blk["attn_qkv"](h).reshape(n, 3, nh, hd)
        q, k, v = [qkv[:, j].transpose(1, 0, 2) for j in range(3)]  # [nh, N, hd]
        qf, kf = q.astype(jnp.float32), k.astype(jnp.float32)
        q = (qf * cos + _rotate_half(qf) * sin).astype(x.dtype)
        k = (kf * cos + _rotate_half(kf) * sin).astype(x.dtype)
        scores = jnp.einsum("hnd,hmd->hnm", q, k,
                            preferred_element_type=jnp.float32) * (hd ** -0.5)
        probs = jax.nn.softmax(scores + mask, axis=-1).astype(x.dtype)
        att = jnp.einsum("hnm,hmd->hnd", probs, v)
        att = att.transpose(1, 0, 2).reshape(n, nh * hd)
        x = x + blk["attn_proj"](att)
        h = _layer_norm(x, blk["norm2"], 1e-6)
        x = x + blk["fc2"](quick_gelu(blk["fc1"](h)))

    m2 = cfg.spatial_merge_size ** 2
    h = _layer_norm(x, params["merger_ln_q"], 1e-6).reshape(n // m2, m2 * cfg.embed_dim)
    return params["merger_fc2"](jax.nn.gelu(params["merger_fc1"](h)))


# --------------------------------------------------------------------------
# text tower (Qwen2 + M-RoPE)
# --------------------------------------------------------------------------


def _mrope_cos_sin(cfg: Qwen2VLConfig, position_ids: Array) -> Tuple[Array, Array]:
    """cos/sin [B, 1, T, head_dim] from 3 position streams [3, B, T]: the
    head is split into mrope_section chunks (doubled across the two rotary
    halves), chunk i driven by stream i%3 (≙ HF
    `apply_multimodal_rotary_pos_emb`, modeling_qwen2_vl.py:156)."""
    hd = cfg.text.head_dim_
    inv = 1.0 / (cfg.text.rope_theta ** (
        jnp.arange(0, hd, 2, dtype=jnp.float32) / hd))
    freqs = position_ids[..., None].astype(jnp.float32) * inv  # [3, B, T, hd/2]
    emb = jnp.concatenate([freqs, freqs], axis=-1)  # [3, B, T, hd]
    cos3, sin3 = jnp.cos(emb), jnp.sin(emb)
    sections = list(cfg.mrope_section) * 2
    off, cos_parts, sin_parts = 0, [], []
    for i, sec in enumerate(sections):
        cos_parts.append(cos3[i % 3, ..., off:off + sec])
        sin_parts.append(sin3[i % 3, ..., off:off + sec])
        off += sec
    cos = jnp.concatenate(cos_parts, axis=-1)[:, None]  # [B, 1, T, hd]
    sin = jnp.concatenate(sin_parts, axis=-1)[:, None]
    return cos, sin


def forward(
    params: dict,
    cfg: Qwen2VLConfig,
    tokens: Optional[Array],
    cache: Optional[KVCache] = None,
    start_pos: "int | Array" = 0,
    position_ids: Optional[Array] = None,  # [3, B, T] M-RoPE streams
    inputs_embeds: Optional[Array] = None,
) -> Tuple[Array, Optional[KVCache]]:
    """Text-model forward (llama walk + M-RoPE cos/sin). With
    `position_ids=None` all three streams equal `start_pos + arange(t)` —
    standard RoPE (text-only prompts). `inputs_embeds` carries spliced
    vision embeddings (see `embed_multimodal`)."""
    tcfg = cfg.text
    if inputs_embeds is not None:
        x = inputs_embeds
        b, t = x.shape[:2]
    else:
        b, t = tokens.shape
        x = jnp.take(params["embed_tokens"], tokens, axis=0)

    _, cos, sin, mask = llama.positions_and_masks(
        tcfg, t, start_pos, None if cache is None else cache.max_len
    )
    if position_ids is not None:
        cos, sin = _mrope_cos_sin(cfg, position_ids)

    if cache is not None:
        k_all, v_all = cache.k, cache.v
    else:
        k_all = v_all = None

    for i, layer in enumerate(params["layers"]):
        h = rms_norm(x, layer["input_layernorm"], tcfg.rms_norm_eps)
        if cache is None:
            # cache-free path: _attention_nocache applies whatever cos/sin
            # it is given — M-RoPE tables slot straight in
            attn_out = llama._attention_nocache(
                layer["self_attn"], tcfg, h, mask, cos, sin
            )
        else:
            attn_out, k_all, v_all = llama._attention(
                layer["self_attn"], tcfg, h, k_all, v_all, i, start_pos,
                mask, cos, sin,
            )
        x = x + attn_out
        h = rms_norm(x, layer["post_attention_layernorm"], tcfg.rms_norm_eps)
        x = x + llama._mlp(layer["mlp"], h)

    x = rms_norm(x, params["norm"], tcfg.rms_norm_eps)
    if tcfg.tie_word_embeddings or "lm_head" not in params:
        logits = jnp.einsum("btd,vd->btv", x, params["embed_tokens"],
                            preferred_element_type=jnp.float32)
    else:
        logits = params["lm_head"](x).astype(jnp.float32)
    new_cache = KVCache(k=k_all, v=v_all) if cache is not None else None
    return logits, new_cache


def embed_multimodal(
    params: dict, cfg: Qwen2VLConfig, tokens: Array, image_embeds: Array
) -> Array:
    """Token embeddings with vision rows spliced over the image-token
    placeholders (≙ HF masked_scatter on image_token_id). `tokens` [B, T]
    must contain exactly image_embeds.shape[0] placeholder tokens."""
    x = jnp.take(params["embed_tokens"], tokens, axis=0)
    b, t, d = x.shape
    flat = x.reshape(b * t, d)
    is_img = (tokens == cfg.image_token_id).reshape(-1)
    # scatter row j of image_embeds into the j-th placeholder position
    dest = jnp.nonzero(is_img, size=image_embeds.shape[0])[0]
    flat = flat.at[dest].set(image_embeds.astype(flat.dtype))
    return flat.reshape(b, t, d)


def get_mrope_positions(
    cfg: Qwen2VLConfig, tokens: np.ndarray, grid_thw
) -> np.ndarray:
    """Host-side M-RoPE position ids [3, 1, T] for one sequence with images
    (≙ HF `get_rope_index`, modeling_qwen2_vl.py): text tokens advance all
    three streams together; an image's patches get (t, h, w) grid positions
    offset by the running position; after each image the text stream resumes
    at max(position) + 1. `grid_thw` rows are per-image (t, h, w) in MERGED
    units (grid divided by spatial_merge_size for h/w)."""
    toks = np.asarray(tokens).reshape(-1)
    m = cfg.vision.spatial_merge_size
    pos = np.zeros((3, len(toks)), np.int64)
    cur = 0  # next position value
    img = 0
    i = 0
    while i < len(toks):
        if toks[i] == cfg.image_token_id:
            t, h, w = grid_thw[img]
            h, w = h // m, w // m
            n = t * h * w
            tt = np.repeat(np.arange(t), h * w)
            hh = np.tile(np.repeat(np.arange(h), w), t)
            ww = np.tile(np.arange(w), t * h)
            pos[0, i:i + n] = cur + tt
            pos[1, i:i + n] = cur + hh
            pos[2, i:i + n] = cur + ww
            cur = cur + max(t, h, w)
            img += 1
            i += n
        else:
            pos[:, i] = cur
            cur += 1
            i += 1
    return pos[:, None, :]


# --------------------------------------------------------------------------
# HF weights
# --------------------------------------------------------------------------


def params_from_hf_state_dict(state: dict, cfg: Qwen2VLConfig, dtype=jnp.bfloat16):
    """(text_params, vision_params) from a Qwen2VLForConditionalGeneration
    state dict. Text keys live under `model.language_model.` (transformers
    >= 4.52) or `model.` (older); vision under `visual.` or
    `model.visual.`."""
    from .hf import params_from_hf_state_dict as llama_loader

    def np_of(x):
        return x.detach().to("cpu").float().numpy() if hasattr(x, "detach") else np.asarray(x)

    # --- re-key the text tower for the llama loader --------------------
    text_state = {}
    for k, v in state.items():
        for pref in ("model.language_model.", "language_model.model."):
            if k.startswith(pref):
                text_state["model." + k[len(pref):]] = v
                break
        else:
            if k.startswith("model.") and not k.startswith("model.visual."):
                text_state[k] = v
            elif k == "lm_head.weight":
                text_state[k] = v
    text = llama_loader(text_state, cfg.text, dtype)

    # --- vision tower --------------------------------------------------
    vpref = next(p for p in ("model.visual.", "visual.")
                 if any(k.startswith(p) for k in state))

    def arr(name):
        return jnp.asarray(np_of(state[vpref + name]), dtype)

    def lin(name):
        return Linear(weight=arr(name + ".weight"),
                      bias=arr(name + ".bias") if vpref + name + ".bias" in state else None)

    def ln(name):
        return {"weight": arr(name + ".weight"), "bias": arr(name + ".bias")}

    vc = cfg.vision
    pe = np_of(state[vpref + "patch_embed.proj.weight"])  # [E, C, tp, p, p]
    blocks = []
    for i in range(vc.depth):
        p = f"blocks.{i}"
        blocks.append({
            "norm1": ln(f"{p}.norm1"),
            "attn_qkv": lin(f"{p}.attn.qkv"),
            "attn_proj": lin(f"{p}.attn.proj"),
            "norm2": ln(f"{p}.norm2"),
            "fc1": lin(f"{p}.mlp.fc1"),
            "fc2": lin(f"{p}.mlp.fc2"),
        })
    vision = {
        "patch_embed": Linear(weight=jnp.asarray(
            pe.reshape(vc.embed_dim, -1), dtype)),
        "blocks": blocks,
        "merger_ln_q": ln("merger.ln_q"),
        "merger_fc1": lin("merger.mlp.0"),
        "merger_fc2": lin("merger.mlp.2"),
    }
    return text, vision


def serving_forward_fns(cfg: Qwen2VLConfig):
    """(forward_fn, embeds_forward_fn) for `ContinuousBatchingEngine(...,
    mrope_offsets=True)` — qwen2_vl through the batching engine (the vLLM
    role `/root/reference/examples/vllm_qwenvl.py` plays).

    Decode rope runs at cache_length + per-slot offset: after the prompt all
    three M-RoPE streams advance together, so a single scalar offset
    (max_prompt_position + 1 - prompt_len, see `get_mrope_positions`)
    reproduces `HQQVLModel.generate`'s positions exactly; text-only slots
    carry offset 0 = standard RoPE."""

    def fwd(params, toks, cache, pos, offs=None):
        if offs is None:  # token prefill path (text-only prompts)
            return forward(params, cfg, toks, cache, pos)
        b, t = toks.shape
        base = (pos + offs)[None, :, None] + jnp.arange(t)[None, None, :]
        pid = jnp.broadcast_to(base, (3, b, t))
        return forward(params, cfg, toks, cache, pos, position_ids=pid)

    def efwd(params, embeds, cache, pos, position_ids):
        return forward(params, cfg, None, cache, pos,
                       position_ids=position_ids, inputs_embeds=embeds)

    return fwd, efwd
