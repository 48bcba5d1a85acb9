# SPDX-License-Identifier: Apache-2.0
"""LLaVA — CLIP vision tower + MLP projector + Llama language model.

The reference ships LLaVA only as an example on top of transformers
(`/root/reference/examples/`, LLaVA-1.6-34B script; vision kept fp, language
model HQQ-quantized). Here it is a first-class family: a functional CLIP
vision encoder (pre-LN, class embedding, quick-GELU), the 2-layer GELU
projector, and token-embedding splice over `image_token_index` placeholders
feeding `llama.forward(inputs_embeds=...)` — positions are ordinary
sequential RoPE (LLaVA-1.5 semantics, unlike Qwen2-VL's M-RoPE).

HF parity: `params_from_hf_state_dict` maps a
`LlavaForConditionalGeneration` state dict (vision_tower.vision_model.*,
multi_modal_projector.*, language_model.*); `vision_forward` reproduces
`vision_feature_layer` (default -2: the penultimate encoder layer's output,
post_layernorm never applied) and `vision_feature_select_strategy`
("default" drops the CLS row).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import Array

from ..nn.linear import Linear
from . import llama

__all__ = [
    "ClipVisionConfig",
    "LlavaConfig",
    "init_params",
    "vision_forward",
    "embed_multimodal",
    "forward",
    "init_cache",
    "params_from_hf_state_dict",
    "VISION_FP_TAGS",
]

# vision linears that stay fp under quantize_model: patch/class/position
# embeddings and the projector (tiny and quality-critical, like lm_head)
VISION_FP_TAGS = ("patch_proj", "linear_1", "linear_2")


@dataclass(frozen=True)
class ClipVisionConfig:
    hidden_size: int = 1024
    intermediate_size: int = 4096
    num_hidden_layers: int = 24
    num_attention_heads: int = 16
    image_size: int = 336
    patch_size: int = 14
    num_channels: int = 3
    layer_norm_eps: float = 1e-5
    hidden_act: str = "quick_gelu"

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @property
    def head_dim_(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @classmethod
    def from_hf(cls, hf: dict) -> "ClipVisionConfig":
        return cls(
            hidden_size=hf["hidden_size"],
            intermediate_size=hf["intermediate_size"],
            num_hidden_layers=hf["num_hidden_layers"],
            num_attention_heads=hf["num_attention_heads"],
            image_size=hf.get("image_size", 336),
            patch_size=hf.get("patch_size", 14),
            num_channels=hf.get("num_channels", 3),
            layer_norm_eps=hf.get("layer_norm_eps", 1e-5),
            hidden_act=hf.get("hidden_act", "quick_gelu"),
        )


@dataclass(frozen=True)
class LlavaConfig:
    text: llama.LlamaConfig = field(default_factory=llama.LlamaConfig)
    vision: ClipVisionConfig = field(default_factory=ClipVisionConfig)
    image_token_index: int = 32000
    vision_feature_layer: int = -2
    vision_feature_select_strategy: str = "default"

    @classmethod
    def from_hf(cls, hf: dict) -> "LlavaConfig":
        return cls(
            text=llama.LlamaConfig.from_hf(hf["text_config"]),
            vision=ClipVisionConfig.from_hf(hf["vision_config"]),
            image_token_index=hf.get("image_token_index", 32000),
            vision_feature_layer=hf.get("vision_feature_layer", -2),
            vision_feature_select_strategy=hf.get(
                "vision_feature_select_strategy", "default"
            ),
        )

    @classmethod
    def tiny(cls, vocab_size: int = 256) -> "LlavaConfig":
        return cls(
            text=llama.LlamaConfig(
                vocab_size=vocab_size, hidden_size=64, intermediate_size=48,
                num_hidden_layers=2, num_attention_heads=4,
                num_key_value_heads=2, max_position_embeddings=256,
            ),
            vision=ClipVisionConfig(
                hidden_size=32, intermediate_size=64, num_hidden_layers=3,
                num_attention_heads=4, image_size=16, patch_size=4,
            ),
            image_token_index=vocab_size - 2,
        )


# --------------------------------------------------------------------------
# CLIP vision tower
# --------------------------------------------------------------------------


def _quick_gelu(x: Array) -> Array:
    return x * jax.nn.sigmoid(1.702 * x)


_VISION_ACTS = {
    "quick_gelu": _quick_gelu,
    "gelu": lambda x: jax.nn.gelu(x, approximate=False),
    "gelu_new": lambda x: jax.nn.gelu(x, approximate=True),
    "gelu_pytorch_tanh": lambda x: jax.nn.gelu(x, approximate=True),
}


def _layer_norm(x: Array, p: dict, eps: float) -> Array:
    dt = x.dtype
    x = x.astype(jnp.float32)
    mu = x.mean(axis=-1, keepdims=True)
    var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
    x = (x - mu) * jax.lax.rsqrt(var + eps)
    return (
        x * p["weight"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    ).astype(dt)


def _patchify(pixels: Array, p: int) -> Array:
    """[B, C, H, W] -> [B, N, C*p*p] in (c, ph, pw) flatten order (the HF
    conv-as-matmul equivalence, same as models/vit.py)."""
    b, c, h, w = pixels.shape
    x = pixels.reshape(b, c, h // p, p, w // p, p)
    x = x.transpose(0, 2, 4, 1, 3, 5)
    return x.reshape(b, (h // p) * (w // p), c * p * p)


def _vision_attention(layer: dict, cfg: ClipVisionConfig, x: Array) -> Array:
    b, t, d = x.shape
    nh, hd = cfg.num_attention_heads, cfg.head_dim_
    q = layer["q_proj"](x).reshape(b, t, nh, hd).transpose(0, 2, 1, 3)
    k = layer["k_proj"](x).reshape(b, t, nh, hd).transpose(0, 2, 1, 3)
    v = layer["v_proj"](x).reshape(b, t, nh, hd).transpose(0, 2, 1, 3)
    scores = jnp.einsum("bhtd,bhsd->bhts", q, k, preferred_element_type=jnp.float32)
    scores = scores / jnp.sqrt(hd).astype(jnp.float32)
    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    out = jnp.einsum("bhts,bhsd->bhtd", probs, v)
    return layer["out_proj"](out.transpose(0, 2, 1, 3).reshape(b, t, d))


def vision_forward(params: dict, cfg: LlavaConfig, pixels: Array) -> Array:
    """[B, C, H, W] pixels -> projected vision embeddings
    [B, n_patches(, -1 with CLS dropped), text_hidden].

    Follows HF `LlavaForConditionalGeneration.get_image_features`:
    run the CLIP encoder, take hidden_states[vision_feature_layer]
    (indexing the [embeddings, layer1..layerL] list — -2 stops one layer
    short, post_layernorm never applied), drop CLS under the "default"
    strategy, then the 2-layer GELU projector."""
    vc = cfg.vision
    vp = params["vision"]
    b = pixels.shape[0]
    patches = _patchify(pixels.astype(jnp.float32), vc.patch_size)
    x = vp["patch_proj"](patches.astype(vp["class_embedding"].dtype))
    cls = jnp.broadcast_to(vp["class_embedding"], (b, 1, vc.hidden_size))
    x = jnp.concatenate([cls, x], axis=1) + vp["position_embeddings"]
    x = _layer_norm(x, vp["pre_layernorm"], vc.layer_norm_eps)

    fl = cfg.vision_feature_layer
    n_run = vc.num_hidden_layers + 1 + fl if fl < 0 else fl
    act = _VISION_ACTS[vc.hidden_act]
    for layer in vp["layers"][:n_run]:
        h = _layer_norm(x, layer["layer_norm1"], vc.layer_norm_eps)
        x = x + _vision_attention(layer, vc, h)
        h = _layer_norm(x, layer["layer_norm2"], vc.layer_norm_eps)
        x = x + layer["fc2"](act(layer["fc1"](h)))

    if cfg.vision_feature_select_strategy == "default":
        x = x[:, 1:]  # drop CLS
    proj = params["projector"]
    return proj["linear_2"](jax.nn.gelu(proj["linear_1"](x), approximate=False))


# --------------------------------------------------------------------------
# Multimodal splice + text forward (plain llama semantics)
# --------------------------------------------------------------------------


def embed_multimodal(
    params: dict, cfg: LlavaConfig, tokens: Array, image_embeds: Array
) -> Array:
    """Token embeddings with vision rows spliced over `image_token_index`
    placeholders (≙ HF masked_scatter). `image_embeds` [n, D] flattened over
    images; `tokens` [B, T] must contain exactly n placeholders."""
    text = params["text"]
    x = jnp.take(text["embed_tokens"], tokens, axis=0)
    b, t, d = x.shape
    flat = x.reshape(b * t, d)
    is_img = (tokens == cfg.image_token_index).reshape(-1)
    try:  # host-side check when tokens are concrete (all engine/gen paths):
        n_ph = int(np.asarray(is_img).sum())
        assert n_ph == image_embeds.shape[0], (
            f"prompt has {n_ph} image placeholders but image_embeds carries "
            f"{image_embeds.shape[0]} rows (HF raises 'Image features and "
            f"image tokens do not match' here; a silent nonzero-pad scatter "
            f"would corrupt token 0)"
        )
    except jax.errors.TracerArrayConversionError:
        pass  # traced tokens: sizes must be guaranteed by the caller
    dest = jnp.nonzero(is_img, size=image_embeds.shape[0])[0]
    flat = flat.at[dest].set(image_embeds.astype(flat.dtype))
    return flat.reshape(b, t, d)


def forward(params, cfg: LlavaConfig, tokens, cache=None, start_pos=0, **kw):
    """Text forward = plain llama (sequential positions). `params` may be the
    full {"text","vision","projector"} tree or just the text tree."""
    text = params["text"] if isinstance(params, dict) and "text" in params else params
    return llama.forward(text, cfg.text, tokens, cache, start_pos, **kw)


def init_cache(cfg: LlavaConfig, batch: int, max_len: int, dtype=jnp.bfloat16):
    return llama.init_cache(cfg.text, batch, max_len, dtype)


# --------------------------------------------------------------------------
# Params
# --------------------------------------------------------------------------


def init_params(cfg: LlavaConfig, key: Array, dtype=jnp.float32) -> dict:
    vc = cfg.vision
    d, f = vc.hidden_size, vc.intermediate_size
    td = cfg.text.hidden_size
    keys = iter(jax.random.split(key, 16 + 8 * vc.num_hidden_layers))

    def lin(o, i):
        w = jax.random.normal(next(keys), (o, i), jnp.float32) / np.sqrt(i)
        return Linear(weight=w.astype(dtype), bias=jnp.zeros((o,), dtype))

    def ln(n):
        return {"weight": jnp.ones((n,), dtype), "bias": jnp.zeros((n,), dtype)}

    layers = []
    for _ in range(vc.num_hidden_layers):
        layers.append({
            "layer_norm1": ln(d),
            "q_proj": lin(d, d),
            "k_proj": lin(d, d),
            "v_proj": lin(d, d),
            "out_proj": lin(d, d),
            "layer_norm2": ln(d),
            "fc1": lin(f, d),
            "fc2": lin(d, f),
        })
    vision = {
        "class_embedding": (jax.random.normal(next(keys), (1, 1, d)) * 0.02).astype(dtype),
        "position_embeddings": (
            jax.random.normal(next(keys), (1, vc.num_patches + 1, d)) * 0.02
        ).astype(dtype),
        "patch_proj": Linear(
            weight=(jax.random.normal(
                next(keys), (d, vc.num_channels * vc.patch_size**2)
            ) * 0.02).astype(dtype),
        ),
        "pre_layernorm": ln(d),
        "layers": layers,
    }
    projector = {"linear_1": lin(td, d), "linear_2": lin(td, td)}
    text = llama.init_params(cfg.text, next(keys), dtype=dtype)
    return {"text": text, "vision": vision, "projector": projector}


def params_from_hf_state_dict(
    state: dict, cfg: LlavaConfig, dtype=jnp.float32
) -> Tuple[dict, dict]:
    """Map a HF `LlavaForConditionalGeneration` state dict; returns
    (text_params, vision_params) where vision_params also carries the
    projector (the VL engine's two-tree contract)."""

    def np_of(x):
        if hasattr(x, "detach"):
            x = x.detach().cpu().numpy()
        return np.asarray(x)

    def arr(name):
        return jnp.asarray(np_of(state[name]), dtype)

    def lin(name):
        b = f"{name}.bias"
        return Linear(
            weight=arr(f"{name}.weight"),
            bias=arr(b) if b in state else None,
        )

    def ln(name):
        return {"weight": arr(f"{name}.weight"), "bias": arr(f"{name}.bias")}

    # transformers >= 4.52 nests the towers under model.* (with the decoder
    # directly at model.language_model.*) and hoists lm_head to the top —
    # normalize to the classic layout: vision_tower.*, multi_modal_projector.*,
    # language_model.model.*, language_model.lm_head.weight
    if any(k.startswith("model.vision_tower") for k in state):
        new = {}
        for k, v in state.items():
            if k.startswith("model.language_model."):
                new["language_model.model." + k[len("model.language_model."):]] = v
            elif k.startswith("model."):
                new[k[len("model."):]] = v
            else:
                new[k] = v
        if "lm_head.weight" in new:
            new["language_model.lm_head.weight"] = new.pop("lm_head.weight")
        state = new

    vt = "vision_tower.vision_model"
    vc = cfg.vision
    layers = []
    for i in range(vc.num_hidden_layers):
        p = f"{vt}.encoder.layers.{i}"
        layers.append({
            "layer_norm1": ln(f"{p}.layer_norm1"),
            "q_proj": lin(f"{p}.self_attn.q_proj"),
            "k_proj": lin(f"{p}.self_attn.k_proj"),
            "v_proj": lin(f"{p}.self_attn.v_proj"),
            "out_proj": lin(f"{p}.self_attn.out_proj"),
            "layer_norm2": ln(f"{p}.layer_norm2"),
            "fc1": lin(f"{p}.mlp.fc1"),
            "fc2": lin(f"{p}.mlp.fc2"),
        })
    conv_w = np_of(state[f"{vt}.embeddings.patch_embedding.weight"])
    d = conv_w.shape[0]
    vision = {
        "class_embedding": jnp.asarray(
            np_of(state[f"{vt}.embeddings.class_embedding"]).reshape(1, 1, d), dtype
        ),
        "position_embeddings": jnp.asarray(
            np_of(state[f"{vt}.embeddings.position_embedding.weight"])[None], dtype
        ),
        "patch_proj": Linear(weight=jnp.asarray(conv_w.reshape(d, -1), dtype)),
        "pre_layernorm": ln(f"{vt}.pre_layrnorm"),  # HF's historical typo
        "layers": layers,
    }
    projector = {
        "linear_1": lin("multi_modal_projector.linear_1"),
        "linear_2": lin("multi_modal_projector.linear_2"),
    }

    from . import hf as hf_loader

    lm_state = {
        k[len("language_model."):]: v
        for k, v in state.items()
        if k.startswith("language_model.")
    }
    text = hf_loader.params_from_hf_state_dict(lm_state, cfg.text, dtype)
    return text, {"vision": vision, "projector": projector}
