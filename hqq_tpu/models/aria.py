# SPDX-License-Identifier: Apache-2.0
"""Aria — Idefics3/SigLIP vision tower + cross-attention projector + grouped-
expert MoE language model (rhymes-ai/Aria).

The reference serves Aria through a bespoke grouped-GEMM quantization path
(`/root/reference/hqq/utils/aria.py:19-227`: per-expert torchao-int4 packs
stacked into `HQQGroupedGemm`, cumsum token dispatch, vision tower kept fp)
plus a multimodal compiled runtime (`:263-311`). Here it is a first-class
family on framework parts: the text MoE uses stacked `GroupedQuantLinear`s
with GShard capacity dispatch (`nn/moe.py`, the same machinery as
qwen3-moe/mixtral — expert-parallel-shardable along E), attention reuses
`llama._attention`, and the vision/projector towers are functional JAX.

HF parity (`transformers.AriaForConditionalGeneration`):
* vision tower = Idefics3 (SigLIP-style: conv patch embed + learned position
  embeddings, pre-LN encoder layers, gelu_pytorch_tanh MLP); Aria's
  `get_image_features` takes `hidden_states[vision_feature_layer]` (default
  -1 — the LAST encoder layer output, post_layernorm NEVER applied since it
  only touches `last_hidden_state`),
* projector = learned queries cross-attending to patch features: q/k/v
  pre-projections over layer-normed inputs, then a full
  `nn.MultiheadAttention` (its OWN in_proj/out_proj — the double projection
  is the architecture, not a bug), `linear`, then FFN(LN(attn)) with
  gelu_new and NO residual,
* text MoE layer = router -> softmax over top-k logits (== renormalized
  full-softmax restricted to top-k, exactly `moe_dispatch`'s convention) ->
  grouped experts fc1 [E, d, 2f] chunked into (projection, gate) with
  silu(projection)*gate -> fc2, PLUS always-on shared experts (a llama MLP
  at width f * moe_num_shared_experts).

Full-square-image mode: Idefics3's NaViT-style fractional position buckets
reduce to `arange(num_patches)` when the image is the configured square
resolution (every Aria checkpoint's processor output), which is what the
engine feeds.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import Array

from ..nn.linear import Linear
from ..nn.moe import GroupedLinear, moe_dispatch, quantize_grouped
from . import llama
from .llama import KVCache, rms_norm
from .llava import _VISION_ACTS, _layer_norm, _patchify

__all__ = [
    "AriaTextConfig",
    "IdeficsVisionConfig",
    "AriaConfig",
    "init_params",
    "vision_forward",
    "embed_multimodal",
    "forward",
    "init_cache",
    "quantize_aria",
    "params_from_hf_state_dict",
]


@dataclass(frozen=True)
class AriaTextConfig(llama.LlamaConfig):
    moe_num_experts: int = 8
    moe_topk: int = 2
    moe_num_shared_experts: int = 2
    capacity_factor: float = 2.0
    # Expert-parallel axis (see mixtral.MixtralConfig.ep_axis): set by
    # `parallel.tp.prepare_tp` when expert stacks shard over the mesh.
    ep_axis: Optional[str] = None

    @classmethod
    def from_hf(cls, hf: dict) -> "AriaTextConfig":
        base = llama.LlamaConfig.from_hf(hf)
        return cls(
            **dataclasses.asdict(base),
            moe_num_experts=hf.get("moe_num_experts", 8),
            moe_topk=hf.get("moe_topk", 2),
            moe_num_shared_experts=hf.get("moe_num_shared_experts", 2),
        )


@dataclass(frozen=True)
class IdeficsVisionConfig:
    hidden_size: int = 1152
    intermediate_size: int = 4304
    num_hidden_layers: int = 27
    num_attention_heads: int = 16
    image_size: int = 980
    patch_size: int = 14
    num_channels: int = 3
    layer_norm_eps: float = 1e-6
    hidden_act: str = "gelu_pytorch_tanh"

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @property
    def head_dim_(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @classmethod
    def from_hf(cls, hf: dict) -> "IdeficsVisionConfig":
        return cls(
            hidden_size=hf["hidden_size"],
            intermediate_size=hf["intermediate_size"],
            num_hidden_layers=hf["num_hidden_layers"],
            num_attention_heads=hf["num_attention_heads"],
            image_size=hf["image_size"],
            patch_size=hf["patch_size"],
            num_channels=hf.get("num_channels", 3),
            layer_norm_eps=hf.get("layer_norm_eps", 1e-6),
            hidden_act=hf.get("hidden_act", "gelu_pytorch_tanh"),
        )


@dataclass(frozen=True)
class AriaConfig:
    text: AriaTextConfig = dataclasses.field(default_factory=AriaTextConfig)
    vision: IdeficsVisionConfig = dataclasses.field(
        default_factory=IdeficsVisionConfig
    )
    image_token_index: int = 9
    vision_feature_layer: int = -1
    # (num_patches, query_num) pairs — HF projector_patch_to_query_dict
    # (hashable tuple form; frozen configs are jit static args)
    patch_to_query: tuple = ((1225, 128), (4900, 256))

    def __post_init__(self):
        p2q = self.patch_to_query
        if isinstance(p2q, dict):
            p2q = tuple(sorted((int(k), int(v)) for k, v in p2q.items()))
        else:
            p2q = tuple((int(k), int(v)) for k, v in p2q)
        object.__setattr__(self, "patch_to_query", p2q)

    @property
    def max_query_num(self) -> int:
        return max(v for _, v in self.patch_to_query)

    @classmethod
    def from_hf(cls, hf: dict) -> "AriaConfig":
        return cls(
            text=AriaTextConfig.from_hf(hf["text_config"]),
            vision=IdeficsVisionConfig.from_hf(hf["vision_config"]),
            image_token_index=hf.get("image_token_index", 9),
            vision_feature_layer=hf.get("vision_feature_layer", -1),
            patch_to_query=tuple(sorted(
                (int(k), int(v))
                for k, v in hf.get("projector_patch_to_query_dict",
                                   {1225: 128, 4900: 256}).items()
            )),
        )

    @classmethod
    def tiny(cls, vocab_size: int = 256) -> "AriaConfig":
        return cls(
            text=AriaTextConfig(
                vocab_size=vocab_size, hidden_size=64, intermediate_size=48,
                num_hidden_layers=2, num_attention_heads=4,
                num_key_value_heads=2, max_position_embeddings=128,
                moe_num_experts=4, moe_topk=2, moe_num_shared_experts=2,
            ),
            vision=IdeficsVisionConfig(
                hidden_size=32, intermediate_size=64, num_hidden_layers=2,
                num_attention_heads=4, image_size=16, patch_size=4,
            ),
            image_token_index=254,
            patch_to_query=((16, 4),),
        )


# --------------------------------------------------------------------------
# Vision tower + projector
# --------------------------------------------------------------------------


def _vision_attention(layer: dict, cfg: IdeficsVisionConfig, x: Array) -> Array:
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


def _position_ids(side: int, n_h: int, n_w: int) -> np.ndarray:
    """Idefics3's NaViT fractional-coordinate bucketing (static, so computed
    host-side). NOT identity even at native resolution: the (1 - 1e-6) nudge
    puts every fractional coordinate just BELOW its bucket boundary and
    `right=True` buckets it down, so e.g. side=4 gives per-axis ids
    [0, 0, 1, 2] — duplicated rows are the HF reference behavior and parity
    requires reproducing them (verified vs torch.bucketize)."""
    boundaries = np.arange(1 / side, 1.0, 1 / side)

    def bucket(n):
        frac = np.arange(n) / n * (1 - 1e-6)
        return np.searchsorted(boundaries, frac, side="right")

    bh, bw = bucket(n_h), bucket(n_w)
    return (bh[:, None] * side + bw[None, :]).reshape(-1)


def _tower_forward(params: dict, cfg: AriaConfig, pixels: Array) -> Array:
    """Idefics3 tower on full square images -> hidden_states[vfl] [B, N, H]
    (post_layernorm intentionally NOT applied — see module docstring)."""
    vc = cfg.vision
    vp = params["vision"]
    patches = _patchify(pixels.astype(jnp.float32), vc.patch_size)
    x = vp["patch_proj"](patches.astype(vp["position_embeddings"].dtype))
    side = vc.image_size // vc.patch_size
    pos = _position_ids(side, pixels.shape[2] // vc.patch_size,
                        pixels.shape[3] // vc.patch_size)
    x = x + vp["position_embeddings"][jnp.asarray(pos)]

    fl = cfg.vision_feature_layer
    n_run = vc.num_hidden_layers + 1 + fl if fl < 0 else fl
    act = _VISION_ACTS[vc.hidden_act]
    for layer in vp["layers"][:n_run]:
        h = _layer_norm(x, layer["layer_norm1"], vc.layer_norm_eps)
        x = x + _vision_attention(layer, vc, h)
        h = _layer_norm(x, layer["layer_norm2"], vc.layer_norm_eps)
        x = x + layer["fc2"](act(layer["fc1"](h)))
    return x


def _mha(proj: dict, cfg: AriaConfig, q: Array, k: Array, v: Array) -> Array:
    """torch nn.MultiheadAttention (batch_first) semantics: joint in_proj of
    the ALREADY-projected q/k/v, per-head scaled dot attention, out_proj."""
    b, tq, d = q.shape
    nh = cfg.vision.num_attention_heads
    hd = d // nh
    w = proj["in_proj"].weight  # [3d, d]
    bias = proj["in_proj"].bias
    q2 = q @ w[:d].T + bias[:d]
    k2 = k @ w[d : 2 * d].T + bias[d : 2 * d]
    v2 = v @ w[2 * d :].T + bias[2 * d :]

    def split(x):
        return x.reshape(b, -1, nh, hd).transpose(0, 2, 1, 3)

    qh, kh, vh = split(q2), split(k2), split(v2)
    scores = jnp.einsum("bhtd,bhsd->bhts", qh, kh,
                        preferred_element_type=jnp.float32) / np.sqrt(hd)
    probs = jax.nn.softmax(scores, axis=-1).astype(qh.dtype)
    out = jnp.einsum("bhts,bhsd->bhtd", probs, vh)
    out = out.transpose(0, 2, 1, 3).reshape(b, tq, d)
    return proj["out_proj"](out)


def vision_forward(params: dict, cfg: AriaConfig, pixels: Array) -> Array:
    """[B, C, H, W] pixels -> projected vision embeddings
    [B, query_num, text_hidden] (≙ HF `AriaModel.get_image_features` +
    `AriaProjector`)."""
    feats = _tower_forward(params, cfg, pixels)  # [B, N, H]
    n_patches = feats.shape[1]
    query_num = dict(cfg.patch_to_query)[n_patches]

    proj = params["projector"]
    ca = proj["cross_attn"]
    b = feats.shape[0]
    queries = jnp.broadcast_to(
        proj["query"][:query_num], (b, query_num, proj["query"].shape[-1])
    )
    # the projector's norms are plain nn.LayerNorm (default eps=1e-5), NOT
    # the vision config's 1e-6 (HF AriaCrossAttention/AriaProjector)
    eps = 1e-5
    q = ca["q_proj"](_layer_norm(queries, ca["layer_norm"], eps))
    kv = _layer_norm(feats, ca["layer_norm_kv"], eps)
    attn = _mha(ca, cfg, q, ca["k_proj"](kv), ca["v_proj"](kv))
    attn = ca["linear"](attn)

    h = _layer_norm(attn, proj["layer_norm"], eps)
    return proj["linear_out"](
        jax.nn.gelu(proj["linear_in"](h), approximate=True)
    )


# --------------------------------------------------------------------------
# Text MoE decoder
# --------------------------------------------------------------------------


def _moe_block(mlp: dict, cfg: AriaTextConfig, x: Array) -> Array:
    """Routed grouped experts + shared experts ≙ `AriaTextMoELayer.forward`.

    HF routes with softmax over the top-k logits — identical to
    `moe_dispatch`'s renormalized full-softmax restricted to top-k."""
    b, t, d = x.shape
    xf = x.reshape(b * t, d)
    probs = jax.nn.softmax(mlp["router"](xf).astype(jnp.float32), axis=-1)

    e = cfg.moe_num_experts
    k = cfg.moe_topk
    capacity = max(int(-(-(b * t * k / e * cfg.capacity_factor) // 1)), 1)
    dispatch, combine = moe_dispatch(probs, k, capacity)

    fc1, fc2 = mlp["experts"]["fc1"], mlp["experts"]["fc2"]
    e_local = fc1.n_experts
    ep = cfg.ep_axis is not None and e_local != e
    if ep:
        off = jax.lax.axis_index(cfg.ep_axis) * e_local
        dispatch = jax.lax.dynamic_slice_in_dim(dispatch, off, e_local, axis=1)
        combine = jax.lax.dynamic_slice_in_dim(combine, off, e_local, axis=1)

    expert_in = jnp.einsum("tec,td->ecd", dispatch.astype(xf.dtype), xf)
    h = fc1(expert_in)  # [E, C, 2f]
    proj_h, gate = jnp.split(h, 2, axis=-1)
    expert_out = fc2(jax.nn.silu(proj_h) * gate)

    routed = jnp.einsum("tec,ecd->td", combine.astype(jnp.float32),
                        expert_out.astype(jnp.float32))
    if ep:
        routed = jax.lax.psum(routed, cfg.ep_axis)
    routed = routed.reshape(b, t, d).astype(x.dtype)
    return routed + llama._mlp(mlp["shared_experts"], x)


def forward(
    params: dict,
    cfg,
    tokens: Optional[Array],
    cache: Optional[KVCache] = None,
    start_pos: int | Array = 0,
    kv_valid: Optional[Array] = None,
    inputs_embeds: Optional[Array] = None,
) -> Tuple[Array, Optional[KVCache]]:
    """Text forward (llama attention + Aria MoE MLP). `params` may be the
    full {"text","vision","projector"} tree or just the text tree; `cfg` an
    `AriaConfig` or `AriaTextConfig` (same contract as `llava.forward`)."""
    text = params["text"] if isinstance(params, dict) and "text" in params else params
    tcfg = cfg.text if isinstance(cfg, AriaConfig) else cfg

    if inputs_embeds is not None:
        x = inputs_embeds
        b, t = x.shape[:2]
    else:
        b, t = tokens.shape
        x = jnp.take(text["embed_tokens"], tokens, axis=0)

    _, cos, sin, mask = llama.positions_and_masks(
        tcfg, t, start_pos, None if cache is None else cache.max_len, kv_valid
    )

    k_all = cache.k if cache is not None else None
    v_all = cache.v if cache is not None else None
    for i, layer in enumerate(text["layers"]):
        h = rms_norm(x, layer["input_layernorm"], tcfg.rms_norm_eps)
        if cache is None:
            attn_out = llama._attention_nocache(
                layer["self_attn"], tcfg, h, mask, cos, sin
            )
        else:
            attn_out, k_all, v_all = llama._attention(
                layer["self_attn"], tcfg, h, k_all, v_all, i,
                start_pos, mask, cos, sin,
            )
        x = x + attn_out
        h = rms_norm(x, layer["post_attention_layernorm"], tcfg.rms_norm_eps)
        x = x + _moe_block(layer["mlp"], tcfg, h)

    x = rms_norm(x, text["norm"], tcfg.rms_norm_eps)
    if tcfg.tie_word_embeddings or "lm_head" not in text:
        logits = jnp.einsum("btd,vd->btv", x, text["embed_tokens"],
                            preferred_element_type=jnp.float32)
    else:
        logits = text["lm_head"](x).astype(jnp.float32)
    new_cache = KVCache(k=k_all, v=v_all) if cache is not None else None
    return logits, new_cache


def embed_multimodal(
    params: dict, cfg: AriaConfig, tokens: Array, image_embeds: Array
) -> Array:
    """Token embeddings with vision rows spliced over `image_token_index`
    placeholders (same contract as `llava.embed_multimodal`)."""
    from . import llava

    shim = dataclasses.replace(
        llava.LlavaConfig(text=cfg.text), image_token_index=cfg.image_token_index
    )
    text = params["text"] if "text" in params else params
    return llava.embed_multimodal({"text": text}, shim, tokens, image_embeds)


def init_cache(cfg, batch: int, max_len: int, dtype=jnp.bfloat16):
    tcfg = cfg.text if isinstance(cfg, AriaConfig) else cfg
    return llama.init_cache(tcfg, batch, max_len, dtype)


# --------------------------------------------------------------------------
# Params
# --------------------------------------------------------------------------


def init_params(cfg: AriaConfig, key: Array, dtype=jnp.float32) -> dict:
    tc, vc = cfg.text, cfg.vision
    d, f = tc.hidden_size, tc.intermediate_size
    vd, vf = vc.hidden_size, vc.intermediate_size
    e = tc.moe_num_experts
    keys = iter(jax.random.split(key, 64 + 16 * (tc.num_hidden_layers
                                                 + vc.num_hidden_layers)))

    def lin(o, i, bias=True):
        w = jax.random.normal(next(keys), (o, i), jnp.float32) / np.sqrt(i)
        return Linear(weight=w.astype(dtype),
                      bias=jnp.zeros((o,), dtype) if bias else None)

    def grouped(o, i):
        w = jax.random.normal(next(keys), (e, o, i), jnp.float32) / np.sqrt(i)
        return GroupedLinear(weight=w.astype(dtype))

    def ln(n):
        return {"weight": jnp.ones((n,), dtype), "bias": jnp.zeros((n,), dtype)}

    text_layers = []
    nh, nkv, hd = tc.num_attention_heads, tc.num_key_value_heads, tc.head_dim_
    sf = f * tc.moe_num_shared_experts
    for _ in range(tc.num_hidden_layers):
        text_layers.append({
            "self_attn": {
                "q_proj": lin(nh * hd, d, bias=False),
                "k_proj": lin(nkv * hd, d, bias=False),
                "v_proj": lin(nkv * hd, d, bias=False),
                "o_proj": lin(d, nh * hd, bias=False),
            },
            "mlp": {
                "router": lin(e, d, bias=False),
                "experts": {"fc1": grouped(2 * f, d), "fc2": grouped(d, f)},
                "shared_experts": {
                    "gate_proj": lin(sf, d, bias=False),
                    "up_proj": lin(sf, d, bias=False),
                    "down_proj": lin(d, sf, bias=False),
                },
            },
            "input_layernorm": jnp.ones((d,), dtype),
            "post_attention_layernorm": jnp.ones((d,), dtype),
        })
    text = {
        "embed_tokens": (jax.random.normal(next(keys), (tc.vocab_size, d),
                                           jnp.float32) * 0.02).astype(dtype),
        "layers": text_layers,
        "norm": jnp.ones((d,), dtype),
        "lm_head": lin(tc.vocab_size, d, bias=False),
    }

    vis_layers = []
    for _ in range(vc.num_hidden_layers):
        vis_layers.append({
            "q_proj": lin(vd, vd), "k_proj": lin(vd, vd), "v_proj": lin(vd, vd),
            "out_proj": lin(vd, vd),
            "fc1": lin(vf, vd), "fc2": lin(vd, vf),
            "layer_norm1": ln(vd), "layer_norm2": ln(vd),
        })
    vision = {
        "patch_proj": lin(vd, vc.num_channels * vc.patch_size**2),
        "position_embeddings": (
            jax.random.normal(next(keys), (vc.num_patches, vd), jnp.float32) * 0.02
        ).astype(dtype),
        "layers": vis_layers,
    }

    projector = {
        "query": (jax.random.normal(next(keys), (cfg.max_query_num, vd),
                                    jnp.float32) * 0.02).astype(dtype),
        "cross_attn": {
            "q_proj": lin(vd, vd, bias=False),
            "k_proj": lin(vd, vd, bias=False),
            "v_proj": lin(vd, vd, bias=False),
            "in_proj": lin(3 * vd, vd),
            "out_proj": lin(vd, vd),
            "linear": lin(vd, vd),
            "layer_norm": ln(vd),
            "layer_norm_kv": ln(vd),
        },
        "layer_norm": ln(vd),
        "linear_in": lin(d, vd, bias=False),
        "linear_out": lin(d, d, bias=False),
    }
    return {"text": text, "vision": vision, "projector": projector}


def quantize_aria(
    params: dict,
    attn_config: Optional[dict] = None,
    expert_config: Optional[dict] = None,
    compute_dtype=jnp.bfloat16,
) -> dict:
    """Quantize text attention + shared experts (HQQLinear role) and the
    grouped expert stacks (`HQQGroupedGemm` role, ref `utils/aria.py:178-227`);
    router, lm_head, vision tower, and projector stay fp — exactly the
    reference's placement (`utils/aria.py:219-224` moves vision fp to
    device)."""
    from ..core.quantize import BaseQuantizeConfig
    from .base import quantize_model

    attn_config = attn_config or BaseQuantizeConfig(nbits=4, group_size=64)
    expert_config = expert_config or BaseQuantizeConfig(nbits=4, group_size=64)
    ewqp = expert_config["weight_quant_params"]

    text = quantize_model(
        params["text"], attn_config, compute_dtype,
        ignore=("lm_head", "mlp.router"),
    )
    for layer in text["layers"]:
        experts = layer["mlp"]["experts"]
        for name in ("fc1", "fc2"):
            gl = experts[name]
            if isinstance(gl, GroupedLinear):
                experts[name] = quantize_grouped(
                    gl.weight,
                    nbits=ewqp["nbits"],
                    group_size=ewqp["group_size"],
                    axis=ewqp["axis"],
                    round_zero=ewqp["round_zero"],
                    compute_dtype=compute_dtype,
                )
    return {"text": text, "vision": params["vision"],
            "projector": params["projector"]}


def params_from_hf_state_dict(state, cfg: AriaConfig, dtype=jnp.float32):
    """Convert a HF `AriaForConditionalGeneration` state dict. Returns
    (text_params, {"vision": ..., "projector": ...}) like llava's."""

    def np_of(x):
        if hasattr(x, "detach"):
            x = x.detach().to("cpu").float().numpy()
        return np.asarray(x)

    def arr(name):
        return jnp.asarray(np_of(state[name]), dtype)

    def lin(prefix):
        b = prefix + ".bias"
        return Linear(weight=arr(prefix + ".weight"),
                      bias=arr(b) if b in state else None)

    def ln(prefix):
        return {"weight": arr(prefix + ".weight"), "bias": arr(prefix + ".bias")}

    tc = cfg.text
    layers = []
    for i in range(tc.num_hidden_layers):
        p = f"model.language_model.layers.{i}"
        layers.append({
            "self_attn": {f"{t}_proj": lin(f"{p}.self_attn.{t}_proj")
                          for t in "qkvo"},
            "mlp": {
                "router": lin(f"{p}.mlp.router"),
                "experts": {
                    # HF fc weights are [E, in, out] (tokens @ w); GroupedLinear
                    # wants [E, out, in]
                    "fc1": GroupedLinear(weight=jnp.asarray(
                        np_of(state[f"{p}.mlp.experts.fc1.weight"]), dtype
                    ).transpose(0, 2, 1)),
                    "fc2": GroupedLinear(weight=jnp.asarray(
                        np_of(state[f"{p}.mlp.experts.fc2.weight"]), dtype
                    ).transpose(0, 2, 1)),
                },
                "shared_experts": {
                    f"{t}_proj": lin(f"{p}.mlp.shared_experts.{t}_proj")
                    for t in ("gate", "up", "down")
                },
            },
            "input_layernorm": arr(f"{p}.input_layernorm.weight"),
            "post_attention_layernorm": arr(f"{p}.post_attention_layernorm.weight"),
        })
    text = {
        "embed_tokens": arr("model.language_model.embed_tokens.weight"),
        "layers": layers,
        "norm": arr("model.language_model.norm.weight"),
    }
    if "lm_head.weight" in state:
        text["lm_head"] = lin("lm_head")

    vt = "model.vision_tower"
    conv_w = np_of(state[f"{vt}.embeddings.patch_embedding.weight"])
    vis_layers = []
    for i in range(cfg.vision.num_hidden_layers):
        p = f"{vt}.encoder.layers.{i}"
        vis_layers.append({
            "q_proj": lin(f"{p}.self_attn.q_proj"),
            "k_proj": lin(f"{p}.self_attn.k_proj"),
            "v_proj": lin(f"{p}.self_attn.v_proj"),
            "out_proj": lin(f"{p}.self_attn.out_proj"),
            "fc1": lin(f"{p}.mlp.fc1"), "fc2": lin(f"{p}.mlp.fc2"),
            "layer_norm1": ln(f"{p}.layer_norm1"),
            "layer_norm2": ln(f"{p}.layer_norm2"),
        })
    vision = {
        # conv [H, C, p, p] -> matmul over (c, ph, pw)-flattened patches
        "patch_proj": Linear(
            weight=jnp.asarray(conv_w.reshape(conv_w.shape[0], -1), dtype),
            bias=arr(f"{vt}.embeddings.patch_embedding.bias"),
        ),
        "position_embeddings": arr(f"{vt}.embeddings.position_embedding.weight"),
        "layers": vis_layers,
    }

    mp = "model.multi_modal_projector"
    projector = {
        "query": arr(f"{mp}.query"),
        "cross_attn": {
            "q_proj": lin(f"{mp}.cross_attn.q_proj"),
            "k_proj": lin(f"{mp}.cross_attn.k_proj"),
            "v_proj": lin(f"{mp}.cross_attn.v_proj"),
            "in_proj": Linear(
                weight=arr(f"{mp}.cross_attn.multihead_attn.in_proj_weight"),
                bias=arr(f"{mp}.cross_attn.multihead_attn.in_proj_bias"),
            ),
            "out_proj": lin(f"{mp}.cross_attn.multihead_attn.out_proj"),
            "linear": lin(f"{mp}.cross_attn.linear"),
            "layer_norm": ln(f"{mp}.cross_attn.layer_norm"),
            "layer_norm_kv": ln(f"{mp}.cross_attn.layer_norm_kv"),
        },
        "layer_norm": ln(f"{mp}.layer_norm"),
        "linear_in": lin(f"{mp}.feed_forward.linear_in"),
        "linear_out": lin(f"{mp}.feed_forward.linear_out"),
    }
    return text, {"vision": vision, "projector": projector}
