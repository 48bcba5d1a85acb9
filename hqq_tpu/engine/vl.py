# SPDX-License-Identifier: Apache-2.0
"""Vision-language engine: quantize / save / load / image-conditioned
generate for Qwen2-VL-class checkpoints.

The reference serves Qwen2-VL by delegating to vLLM + AutoProcessor
(`/root/reference/examples/vllm_qwenvl.py`); here the whole pipeline —
quantized vision tower -> patch merger -> embeddings spliced over image
placeholders -> M-RoPE text decode — runs on framework parts, with the
same save/load contract as the text engine (`engine/hf.py`).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..core.quantize import BaseQuantizeConfig
from ..models import base as model_base
from ..models import aria, llama, llava, qwen2_vl

__all__ = ["HQQVLModel", "AutoHQQVLModel"]

_VL_REGISTRY = {"qwen2_vl": qwen2_vl, "llava": llava, "aria": aria}

# vision-tree leaves that stay fp under quantize_model, per architecture
_VISION_FP = {
    "qwen2_vl": ("patch_embed", "merger_fc1", "merger_fc2"),
    "llava": llava.VISION_FP_TAGS,
    # aria: the ENTIRE vision tower + projector stay fp — the reference's
    # placement (`/root/reference/hqq/utils/aria.py:219-224`)
    "aria": None,
}


def _cfg_to_dict(cfg) -> dict:
    return dataclasses.asdict(cfg)


def _cfg_from_dict(d: dict, model_type: str):
    # JSON round-trips tuples to lists; LlamaConfig.__post_init__
    # canonicalizes rope_scaling (its only nested field) from a list
    text = llama.LlamaConfig(**d["text"])
    rest = {k: v for k, v in d.items() if k not in ("text", "vision")}
    if model_type == "llava":
        vision = llava.ClipVisionConfig(**d["vision"])
        return llava.LlavaConfig(text=text, vision=vision, **rest)
    if model_type == "aria":
        atext = aria.AriaTextConfig(**d["text"])
        vision = aria.IdeficsVisionConfig(**d["vision"])
        if "patch_to_query" in rest:
            rest["patch_to_query"] = tuple(
                (int(k), int(v)) for k, v in rest["patch_to_query"]
            )
        return aria.AriaConfig(text=atext, vision=vision, **rest)
    vision = qwen2_vl.VisionConfig(**d["vision"])
    if "mrope_section" in rest:
        rest["mrope_section"] = tuple(rest["mrope_section"])
    return qwen2_vl.Qwen2VLConfig(text=text, vision=vision, **rest)


@dataclasses.dataclass
class HQQVLModel:
    """params = {"text": ..., "vision": ...} functional trees (for llava the
    vision tree also carries the projector)."""

    params: Any
    cfg: Any
    model_type: str = "qwen2_vl"
    quantized: bool = False

    # -- quantization -------------------------------------------------------
    def quantize_model(
        self,
        quant_config: Optional[dict] = None,
        vision_config: Optional[dict] = None,
        compute_dtype=None,
    ) -> "HQQVLModel":
        """Quantize both towers. `quant_config` applies to the text model,
        `vision_config` (default: same) to the vision blocks — the patch
        embed and merger projections stay fp (like lm_head)."""
        assert not self.quantized, "model is already quantized"
        qc = quant_config or BaseQuantizeConfig()
        if self.model_type == "aria":
            # grouped expert stacks quantize through quantize_aria (the
            # HQQGroupedGemm role); vision/projector stay fp
            full = aria.quantize_aria(
                {"text": self.params["text"], **self.params["vision"]},
                attn_config=qc, expert_config=qc,
                compute_dtype=compute_dtype or jnp.bfloat16,
            )
            self.params = {
                "text": full["text"],
                "vision": {"vision": full["vision"],
                           "projector": full["projector"]},
            }
        else:
            self.params = {
                "text": model_base.quantize_model(
                    self.params["text"], qc, compute_dtype
                ),
                "vision": model_base.quantize_model(
                    self.params["vision"], vision_config or qc, compute_dtype,
                    ignore=_VISION_FP[self.model_type],
                ),
            }
        self.quantized = True
        return self

    def prepare_for_inference(self, backend: str = "pallas") -> "HQQVLModel":
        from ..utils.patching import prepare_for_inference

        self.params = {
            "text": prepare_for_inference(self.params["text"], backend),
            # the vision tower runs once per request at prefill width —
            # the bf16-operand kernel path, never the decode kernels
            "vision": prepare_for_inference(
                self.params["vision"],
                "pallas" if backend in ("w4a8", "int8") else backend,
            ),
        }
        return self

    # -- persistence --------------------------------------------------------
    def save_quantized(self, save_dir: str) -> None:
        assert self.quantized, "quantize_model() first"
        model_base.save_quantized(
            self.params,
            save_dir,
            config={
                "model_type": self.model_type,
                "vl_config": _cfg_to_dict(self.cfg),
            },
        )

    # -- inference ----------------------------------------------------------
    def encode_images(self, pixel_values, grid_thw=None):
        """Vision embeddings [n_tokens, text_hidden]: qwen2_vl takes
        [sum(t*h*w), patch_dim] patch rows + grid_thw; llava takes
        [B, C, H, W] pixels."""
        if self.model_type == "llava":
            out = llava.vision_forward(self.params["vision"], self.cfg, pixel_values)
            return out.reshape(-1, self.cfg.text.hidden_size)
        if self.model_type == "aria":
            out = aria.vision_forward(self.params["vision"], self.cfg, pixel_values)
            return out.reshape(-1, self.cfg.text.hidden_size)
        return qwen2_vl.vision_forward(
            self.params["vision"], self.cfg.vision, pixel_values, grid_thw
        )

    def generate(
        self,
        input_ids,
        pixel_values=None,
        grid_thw=None,
        max_new_tokens: int = 32,
        do_sample: bool = False,
        temperature: float = 1.0,
        seed: int = 0,
        eos_token_id: Optional[int] = None,
        max_len: Optional[int] = None,
    ) -> list:
        """Image-conditioned generation for ONE sequence: vision encode ->
        splice over image placeholders -> prefill (M-RoPE for qwen2_vl,
        sequential RoPE for llava) -> KV-cached decode. Text-only when
        `pixel_values` is None."""
        cfg = self.cfg
        is_llava = self.model_type in ("llava", "aria")
        seq_fwd = aria.forward if self.model_type == "aria" else (
            lambda text, tcfg_unused, *a, **kw: llama.forward(text, cfg.text, *a, **kw)
        )
        toks = np.asarray(input_ids).reshape(1, -1)
        t0 = toks.shape[1]
        text = self.params["text"]
        dtype = text["norm"].dtype
        n = max_len or 1 << int(np.ceil(np.log2(t0 + max_new_tokens + 1)))
        cache = llama.init_cache(cfg.text, 1, n, dtype)

        if pixel_values is not None:
            img = self.encode_images(pixel_values, grid_thw)
            if is_llava:
                embed_mm = (aria.embed_multimodal if self.model_type == "aria"
                            else llava.embed_multimodal)
                embeds = embed_mm(
                    self.params, cfg, jnp.asarray(toks, jnp.int32), img
                )
                logits, cache = seq_fwd(
                    text, cfg, None, cache, 0, inputs_embeds=embeds
                )
                mp = t0
            else:
                embeds = qwen2_vl.embed_multimodal(
                    text, cfg, jnp.asarray(toks, jnp.int32), img
                )
                pos = qwen2_vl.get_mrope_positions(cfg, toks[0], grid_thw)
                logits, cache = qwen2_vl.forward(
                    text, cfg, None, cache, 0,
                    position_ids=jnp.asarray(pos), inputs_embeds=embeds,
                )
                mp = int(pos.max()) + 1
        elif is_llava:
            logits, cache = seq_fwd(
                text, cfg, jnp.asarray(toks, jnp.int32), cache, 0
            )
            mp = t0
        else:
            logits, cache = qwen2_vl.forward(
                text, cfg, jnp.asarray(toks, jnp.int32), cache, 0
            )
            mp = t0

        if is_llava:
            step = jax.jit(
                lambda p, t, c, s, pid: seq_fwd(p, cfg, t, c, s)
            )
        else:
            step = jax.jit(
                lambda p, t, c, s, pid: qwen2_vl.forward(
                    p, cfg, t, c, s, position_ids=pid
                )
            )
        key = jax.random.PRNGKey(seed)

        def pick(lg, key):
            if do_sample:
                key, sub = jax.random.split(key)
                return int(jax.random.categorical(sub, lg / temperature)), key
            return int(jnp.argmax(lg)), key

        out = []
        nxt, key = pick(logits[0, -1], key)
        out.append(nxt)
        p = t0
        for _ in range(max_new_tokens - 1):
            if eos_token_id is not None and out[-1] == eos_token_id:
                break
            logits, cache = step(
                text, jnp.asarray([[out[-1]]], jnp.int32), cache,
                jnp.asarray(p), jnp.full((3, 1, 1), mp),
            )
            nxt, key = pick(logits[0, -1], key)
            out.append(nxt)
            p += 1
            mp += 1
        return out


class AutoHQQVLModel:
    """from_pretrained / from_quantized facade for VL checkpoints
    (≙ the role `vllm.LLM` + AutoProcessor play for the reference)."""

    @classmethod
    def from_pretrained(cls, model_dir: str, compute_dtype=jnp.bfloat16) -> HQQVLModel:
        from ..models import hf as hf_loader

        with open(os.path.join(model_dir, "config.json")) as f:
            hf_cfg = json.load(f)
        model_type = hf_cfg.get("model_type", "qwen2_vl")
        assert model_type in _VL_REGISTRY, (
            f"VL architecture {model_type!r} not supported; "
            f"available: {list(_VL_REGISTRY)}"
        )
        mod = _VL_REGISTRY[model_type]
        cfg_cls = {"llava": llava.LlavaConfig, "aria": aria.AriaConfig}.get(
            model_type, getattr(mod, "Qwen2VLConfig", None)
        )
        cfg = cfg_cls.from_hf(hf_cfg)
        state: dict = {}
        for shard in hf_loader._iter_hf_shards(model_dir):
            state.update(shard)
        text, vision = mod.params_from_hf_state_dict(state, cfg, compute_dtype)
        return HQQVLModel(
            params={"text": text, "vision": vision}, cfg=cfg,
            model_type=model_type,
        )

    @classmethod
    def from_quantized(cls, save_dir: str) -> HQQVLModel:
        params, config = model_base.from_quantized(save_dir)
        return HQQVLModel(
            params=params,
            cfg=_cfg_from_dict(
                config["vl_config"], config.get("model_type", "qwen2_vl")
            ),
            model_type=config.get("model_type", "qwen2_vl"),
            quantized=True,
        )
