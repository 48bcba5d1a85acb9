# SPDX-License-Identifier: Apache-2.0
"""HuggingFace checkpoint interop for Llama-family models.

≙ `/root/reference/hqq/models/hf/base.py` (`BaseHQQHFModel`): where the
reference instantiates a transformers model under `init_empty_weights` and
patches it, the TPU build reads the safetensors shards directly into the
functional param pytree — no torch in the load path. Works with any local
directory laid out like a HF Llama/Mistral checkpoint
(config.json + *.safetensors [+ index]).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax.numpy as jnp
import numpy as np

from ..nn.linear import Linear
from .llama import LlamaConfig

__all__ = ["load_hf_llama", "params_from_hf_state_dict", "read_hf_config"]


def read_hf_config(model_dir: str) -> LlamaConfig:
    with open(os.path.join(model_dir, "config.json")) as f:
        return LlamaConfig.from_hf(json.load(f))


def _iter_hf_shards(model_dir: str):
    from safetensors.numpy import load_file

    index_path = os.path.join(model_dir, "model.safetensors.index.json")
    if os.path.exists(index_path):
        with open(index_path) as f:
            files = sorted(set(json.load(f)["weight_map"].values()))
    else:
        files = sorted(
            f for f in os.listdir(model_dir) if f.endswith(".safetensors")
        )
    for fname in files:
        yield load_file(os.path.join(model_dir, fname))


def params_from_hf_state_dict(
    state: Dict[str, Any], cfg: LlamaConfig, dtype=jnp.bfloat16
) -> dict:
    """Convert a flat HF Llama state dict (name -> array) to the functional
    param pytree used by `hqq_tpu.models.llama.forward`."""

    def arr(name):
        x = state[name]
        if hasattr(x, "detach"):  # torch tensor
            x = x.detach().to("cpu").float().numpy()
        return jnp.asarray(np.asarray(x), dtype)

    def lin(prefix):
        bias_name = prefix + ".bias"
        return Linear(
            weight=arr(prefix + ".weight"),
            bias=arr(bias_name) if bias_name in state else None,
        )

    layers = []
    for i in range(cfg.num_hidden_layers):
        p = f"model.layers.{i}"
        sa = {
            "q_proj": lin(f"{p}.self_attn.q_proj"),
            "k_proj": lin(f"{p}.self_attn.k_proj"),
            "v_proj": lin(f"{p}.self_attn.v_proj"),
            "o_proj": lin(f"{p}.self_attn.o_proj"),
        }
        # Qwen3-style per-head q/k norms, when present
        if f"{p}.self_attn.q_norm.weight" in state:
            sa["q_norm"] = arr(f"{p}.self_attn.q_norm.weight")
            sa["k_norm"] = arr(f"{p}.self_attn.k_norm.weight")
        layers.append(
            {
                "self_attn": sa,
                "mlp": {
                    "gate_proj": lin(f"{p}.mlp.gate_proj"),
                    "up_proj": lin(f"{p}.mlp.up_proj"),
                    "down_proj": lin(f"{p}.mlp.down_proj"),
                },
                "input_layernorm": arr(f"{p}.input_layernorm.weight"),
                "post_attention_layernorm": arr(
                    f"{p}.post_attention_layernorm.weight"
                ),
            }
        )

    params = {
        "embed_tokens": arr("model.embed_tokens.weight"),
        "layers": layers,
        "norm": arr("model.norm.weight"),
    }
    if not cfg.tie_word_embeddings and "lm_head.weight" in state:
        params["lm_head"] = lin("lm_head")
    return params


def load_hf_llama(
    model_dir: str, dtype=jnp.bfloat16, config: Optional[LlamaConfig] = None
):
    """Load a local HF Llama/Mistral checkpoint directory.

    Returns (params, config). Shards are read one at a time to bound host
    memory (matters for 70B-class checkpoints).
    """
    cfg = config or read_hf_config(model_dir)
    state: Dict[str, Any] = {}
    for shard in _iter_hf_shards(model_dir):
        state.update(shard)
    return params_from_hf_state_dict(state, cfg, dtype), cfg
