# SPDX-License-Identifier: Apache-2.0
"""Context parallelism: full-model prefill/eval with the SEQUENCE sharded
across the mesh.

Long-context forward passes don't fit one chip (activations and attention
scale with T); here the token dimension is sharded over the "model" axis:
embeddings / norms / MLPs are local (token-parallel — weights replicated,
each device processes its T/n slice), and attention runs `ring_attention`
(K/V shards rotate over ICI with ppermute, online softmax — see
parallel/ring.py). No full-sequence tensor ever materializes on one device.

The reference has no sequence/context parallelism of any kind (SURVEY §5.7);
this is the TPU-native long-context substrate, usable for PPL eval and
training-style forward passes over quantized models.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..models import llama
from .ring import ring_attention

__all__ = ["cp_forward_fn"]


def _local_attention_ring(layer, cfg, x, axis_name, t_loc):
    """Per-shard attention: projections local, mixing via ring attention."""
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
        q = llama.rms_norm(q, layer["q_norm"], cfg.rms_norm_eps)
        k = llama.rms_norm(k, layer["k_norm"], cfg.rms_norm_eps)

    # global positions of this shard's tokens
    idx = jax.lax.axis_index(axis_name)
    pos = idx * t_loc + jnp.arange(t_loc)
    cos, sin = llama._rope_cos_sin(pos, hd, cfg.rope_theta,
                                   getattr(cfg, 'rope_scaling', None))
    cos = cos[None, None]  # [1, 1, T_loc, hd]
    sin = sin[None, None]
    q = llama._apply_rope(q, cos, sin)
    k = llama._apply_rope(k, cos, sin)

    rep = nh // nkv
    if rep > 1:
        k = jnp.repeat(k, rep, axis=1)
        v = jnp.repeat(v, rep, axis=1)

    out = ring_attention(q, k, v, axis_name, scale=hd**-0.5)
    out = out.transpose(0, 2, 1, 3).reshape(b, t, nh * hd)
    return layer["o_proj"](out)


def cp_forward_fn(mesh: Mesh, cfg, axis_name: str = "model"):
    """Build a jitted context-parallel forward: (params, tokens [B, T]) ->
    logits [B, T, V], with T sharded over `axis_name` (T must divide by the
    axis size). Params replicated; activations live as [B, T/n, ...] shards.
    """
    n = mesh.shape[axis_name]

    def local_fwd(params, tokens):
        t_loc = tokens.shape[1]
        x = jnp.take(params["embed_tokens"], tokens, axis=0)

        for layer in params["layers"]:
            h = llama.rms_norm(x, layer["input_layernorm"], cfg.rms_norm_eps)
            x = x + _local_attention_ring(
                layer["self_attn"], cfg, h, axis_name, t_loc
            )
            h = llama.rms_norm(x, layer["post_attention_layernorm"], cfg.rms_norm_eps)
            x = x + llama._mlp(layer["mlp"], h)

        x = llama.rms_norm(x, params["norm"], cfg.rms_norm_eps)
        if cfg.tie_word_embeddings or "lm_head" not in params:
            logits = jnp.einsum("btd,vd->btv", x, params["embed_tokens"],
                                preferred_element_type=jnp.float32)
        else:
            logits = params["lm_head"](x).astype(jnp.float32)
        return logits

    shard = jax.shard_map(
        local_fwd,
        mesh=mesh,
        in_specs=(P(), P(None, axis_name)),
        out_specs=P(None, axis_name, None),
        check_vma=False,
    )

    @jax.jit
    def fwd(params, tokens):
        assert tokens.shape[1] % n == 0, (
            f"sequence length {tokens.shape[1]} must divide the {axis_name} "
            f"axis size {n}"
        )
        return shard(params, tokens)

    return fwd
