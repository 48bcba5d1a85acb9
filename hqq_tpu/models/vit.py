# SPDX-License-Identifier: Apache-2.0
"""Vision Transformer (HF `ViTModel` conventions) — the vision model family.

The reference ships a timm/ViT engine that is dead code (`engine/timm.py:10`
imports a module that does not exist — SURVEY §2.8); this is the working
TPU-native equivalent: a functional ViT whose linear leaves quantize through
the same `quantize_model` tree walker as the LLMs.

Architecture (HF ViTForImageClassification, pre-LN):
    patches = unfold(pixels, p)                 # [B, N, 3*p*p]
    x = concat(cls, patches @ W_patch) + pos
    per layer: x += attn(LN1(x)); x += mlp(LN2(x))
    logits = classifier(LN(x)[:, 0])
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import Array

from ..nn.linear import Linear

__all__ = ["ViTConfig", "init_params", "forward", "LINEAR_TAGS"]

# quantizable linear tags (the patch projection and classifier stay fp,
# like lm_head/embeddings in the LLM families)
LINEAR_TAGS = (
    "attention.query",
    "attention.key",
    "attention.value",
    "attention.dense",
    "mlp.fc1",
    "mlp.fc2",
)


@dataclass(frozen=True)
class ViTConfig:
    image_size: int = 224
    patch_size: int = 16
    num_channels: int = 3
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    layer_norm_eps: float = 1e-12
    num_labels: int = 1000

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @property
    def head_dim_(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @classmethod
    def from_hf(cls, hf: dict) -> "ViTConfig":
        return cls(
            image_size=hf.get("image_size", 224),
            patch_size=hf.get("patch_size", 16),
            num_channels=hf.get("num_channels", 3),
            hidden_size=hf["hidden_size"],
            intermediate_size=hf["intermediate_size"],
            num_hidden_layers=hf["num_hidden_layers"],
            num_attention_heads=hf["num_attention_heads"],
            layer_norm_eps=hf.get("layer_norm_eps", 1e-12),
            num_labels=len(hf.get("id2label", {})) or 1000,
        )

    @classmethod
    def tiny(cls) -> "ViTConfig":
        return cls(
            image_size=32,
            patch_size=8,
            hidden_size=64,
            intermediate_size=128,
            num_hidden_layers=2,
            num_attention_heads=4,
            num_labels=10,
        )


def init_params(cfg: ViTConfig, key: Array, dtype=jnp.float32) -> dict:
    k_iter = iter(jax.random.split(key, 8 + 6 * cfg.num_hidden_layers))
    d, f = cfg.hidden_size, cfg.intermediate_size
    pdim = cfg.num_channels * cfg.patch_size**2

    def lin(out_f, in_f):
        w = jax.random.normal(next(k_iter), (out_f, in_f), jnp.float32)
        return Linear(
            weight=(w / jnp.sqrt(in_f)).astype(dtype),
            bias=jnp.zeros((out_f,), dtype),
        )

    def ln(n):
        return {"weight": jnp.ones((n,), dtype), "bias": jnp.zeros((n,), dtype)}

    layers = []
    for _ in range(cfg.num_hidden_layers):
        layers.append(
            {
                "layernorm_before": ln(d),
                "attention": {
                    "query": lin(d, d),
                    "key": lin(d, d),
                    "value": lin(d, d),
                    "dense": lin(d, d),
                },
                "layernorm_after": ln(d),
                "mlp": {"fc1": lin(f, d), "fc2": lin(d, f)},
            }
        )
    return {
        "cls_token": jnp.zeros((1, 1, d), dtype),
        "position_embeddings": (
            jax.random.normal(next(k_iter), (1, cfg.num_patches + 1, d), jnp.float32)
            * 0.02
        ).astype(dtype),
        "patch_proj": lin(d, pdim),
        "layers": layers,
        "layernorm": ln(d),
        "classifier": lin(cfg.num_labels, d),
    }


def _layer_norm(x: Array, p: dict, eps: float) -> Array:
    dt = x.dtype
    x = x.astype(jnp.float32)
    mu = x.mean(axis=-1, keepdims=True)
    var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
    x = (x - mu) * jax.lax.rsqrt(var + eps)
    return (x * p["weight"].astype(jnp.float32) + p["bias"].astype(jnp.float32)).astype(dt)


def _patchify(pixels: Array, p: int) -> Array:
    """[B, C, H, W] -> [B, N, C*p*p] in (c, ph, pw) flatten order (HF conv)."""
    b, c, h, w = pixels.shape
    x = pixels.reshape(b, c, h // p, p, w // p, p)
    x = x.transpose(0, 2, 4, 1, 3, 5)  # [B, H/p, W/p, C, p, p]
    return x.reshape(b, (h // p) * (w // p), c * p * p)


def _attention(layer: dict, cfg: ViTConfig, x: Array) -> Array:
    b, t, d = x.shape
    nh, hd = cfg.num_attention_heads, cfg.head_dim_
    q = layer["query"](x).reshape(b, t, nh, hd).transpose(0, 2, 1, 3)
    k = layer["key"](x).reshape(b, t, nh, hd).transpose(0, 2, 1, 3)
    v = layer["value"](x).reshape(b, t, nh, hd).transpose(0, 2, 1, 3)
    scores = jnp.einsum("bhtd,bhsd->bhts", q, k, preferred_element_type=jnp.float32)
    scores = scores / jnp.sqrt(hd).astype(jnp.float32)
    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    out = jnp.einsum("bhts,bhsd->bhtd", probs, v)
    out = out.transpose(0, 2, 1, 3).reshape(b, t, d)
    return layer["dense"](out)


def forward(
    params: dict, cfg: ViTConfig, pixels: Array, pool: str = "cls"
) -> Tuple[Array, Array]:
    """Returns (logits [B, num_labels], hidden [B, N+1, D])."""
    b = pixels.shape[0]
    patches = _patchify(pixels.astype(jnp.float32), cfg.patch_size)
    x = params["patch_proj"](patches.astype(params["cls_token"].dtype))
    cls = jnp.broadcast_to(params["cls_token"], (b, 1, cfg.hidden_size))
    x = jnp.concatenate([cls, x], axis=1) + params["position_embeddings"]

    for layer in params["layers"]:
        h = _layer_norm(x, layer["layernorm_before"], cfg.layer_norm_eps)
        x = x + _attention(layer["attention"], cfg, h)
        h = _layer_norm(x, layer["layernorm_after"], cfg.layer_norm_eps)
        x = x + layer["mlp"]["fc2"](jax.nn.gelu(layer["mlp"]["fc1"](h), approximate=False))

    x = _layer_norm(x, params["layernorm"], cfg.layer_norm_eps)
    pooled = x[:, 0] if pool == "cls" else x.mean(axis=1)
    logits = params["classifier"](pooled) if params.get("classifier") else pooled
    return logits, x


def params_from_hf_state_dict(state, cfg: ViTConfig, dtype=jnp.float32) -> dict:
    """Map a HF `ViTForImageClassification` (or ViTModel+head) state dict."""
    import numpy as np

    def arr(name):
        return jnp.asarray(np.asarray(state[name]), dtype)

    def lin(prefix):
        b = f"{prefix}.bias"
        return Linear(weight=arr(f"{prefix}.weight"), bias=arr(b) if b in state else None)

    def ln(prefix):
        return {"weight": arr(f"{prefix}.weight"), "bias": arr(f"{prefix}.bias")}

    pre = "vit." if any(k.startswith("vit.") for k in state) else ""
    layers = []
    for i in range(cfg.num_hidden_layers):
        p = f"{pre}encoder.layer.{i}"
        layers.append(
            {
                "layernorm_before": ln(f"{p}.layernorm_before"),
                "attention": {
                    "query": lin(f"{p}.attention.attention.query"),
                    "key": lin(f"{p}.attention.attention.key"),
                    "value": lin(f"{p}.attention.attention.value"),
                    "dense": lin(f"{p}.attention.output.dense"),
                },
                "layernorm_after": ln(f"{p}.layernorm_after"),
                "mlp": {
                    "fc1": lin(f"{p}.intermediate.dense"),
                    "fc2": lin(f"{p}.output.dense"),
                },
            }
        )
    conv_w = jnp.asarray(
        __import__("numpy").asarray(
            state[f"{pre}embeddings.patch_embeddings.projection.weight"]
        ),
        dtype,
    )
    d = conv_w.shape[0]
    out = {
        "cls_token": arr(f"{pre}embeddings.cls_token"),
        "position_embeddings": arr(f"{pre}embeddings.position_embeddings"),
        "patch_proj": Linear(
            weight=conv_w.reshape(d, -1),
            bias=arr(f"{pre}embeddings.patch_embeddings.projection.bias"),
        ),
        "layers": layers,
        "layernorm": ln(f"{pre}layernorm"),
    }
    if "classifier.weight" in state:
        out["classifier"] = lin("classifier")
    else:
        out["classifier"] = None
    return out
