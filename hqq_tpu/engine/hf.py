# SPDX-License-Identifier: Apache-2.0
"""User-facing engine: one-stop quantize / save / load / generate.

≙ `/root/reference/hqq/engine/base.py` (`HQQWrapper` registry) +
`engine/hf.py` (`HQQModelForCausalLM`) + `models/hf/base.py`
(`AutoHQQHFModel`). The registry maps HF `model_type` strings to
(config-builder, forward-fn) pairs; the returned `HQQModel` bundles the
param pytree with its config and exposes quantize/save/generate, so the
five-line reference workflow ports directly:

    model = HQQModelForCausalLM.from_pretrained(local_dir)     # fp load
    model.quantize_model(BaseQuantizeConfig(nbits=4, group_size=64))
    model.save_quantized(out_dir)
    model = HQQModelForCausalLM.from_quantized(out_dir)
    ids = model.generate(prompt_ids, max_new_tokens=64)
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, Optional

import jax.numpy as jnp

from ..core.quantize import BaseQuantizeConfig
from ..models import base as model_base
from ..models import hf as hf_loader
from ..models import llama
from ..serving.generate import Generator

__all__ = ["HQQModel", "HQQModelForCausalLM", "AutoHQQHFModel"]

# model_type -> (ConfigCls.from_hf, forward_fn, param loader)
_HQQ_REGISTRY: Dict[str, dict] = {
    "llama": {
        "config": llama.LlamaConfig.from_hf,
        "forward": llama.forward,
        "loader": hf_loader.params_from_hf_state_dict,
    },
}


def _register_mistral():
    # Mistral's decoder is Llama-shaped plus a sliding attention window
    # (≙ reference MistralHQQ reusing the same linear tags,
    # `/root/reference/hqq/models/hf/mistral.py`)
    from ..models import mistral as mistral_mod

    _HQQ_REGISTRY["mistral"] = {
        "config": mistral_mod.MistralConfig.from_hf,
        "forward": mistral_mod.forward,
        "loader": hf_loader.params_from_hf_state_dict,
    }


def _register_phi():
    # ≙ reference PhiHQQ (`/root/reference/hqq/models/hf/phi.py:11-63`)
    from ..models import phi as phi_mod

    _HQQ_REGISTRY["phi"] = {
        "config": phi_mod.PhiConfig.from_hf,
        "forward": phi_mod.forward,
        "loader": phi_mod.params_from_hf_state_dict,
    }
    # Phi-3: natively fused qkv/gate_up — ≙ the reference's hand-built
    # merged-QKV variant (`models/hf/phi_opt.py:8-57`), shipped by HF
    from ..models import phi3 as phi3_mod

    _HQQ_REGISTRY["phi3"] = {
        "config": phi3_mod.Phi3Config.from_hf,
        "forward": phi3_mod.forward,
        "loader": phi3_mod.params_from_hf_state_dict,
    }


def _register_qwen2():
    # Qwen2 is Llama-shaped with attention biases (the HF loader picks up
    # *.bias automatically) — ≙ the reference's Qwen2-VL example support.
    _HQQ_REGISTRY["qwen2"] = {
        "config": llama.LlamaConfig.from_hf,
        "forward": llama.forward,
        "loader": hf_loader.params_from_hf_state_dict,
    }


def _register_qwen3():
    # Qwen3: Llama-shaped + per-head q/k RMSNorm (picked up by the loader,
    # applied in llama._attention when present), no attention biases.
    _HQQ_REGISTRY["qwen3"] = {
        "config": llama.LlamaConfig.from_hf,
        "forward": llama.forward,
        "loader": hf_loader.params_from_hf_state_dict,
    }


def _register_code_families():
    from ..models import olmo2 as olmo2_mod
    from ..models import starcoder2 as sc2_mod

    _HQQ_REGISTRY["starcoder2"] = {
        "config": sc2_mod.Starcoder2Config.from_hf,
        "forward": sc2_mod.forward,
        "loader": sc2_mod.params_from_hf_state_dict,
    }
    _HQQ_REGISTRY["olmo2"] = {
        "config": olmo2_mod.Olmo2Config.from_hf,
        "forward": olmo2_mod.forward,
        "loader": olmo2_mod.params_from_hf_state_dict,
    }
    from ..models import granite as granite_mod

    _HQQ_REGISTRY["granite"] = {
        "config": granite_mod.GraniteConfig.from_hf,
        "forward": granite_mod.forward,
        "loader": hf_loader.params_from_hf_state_dict,
    }


def _register_deepseek3():
    from ..models import deepseek3 as ds3

    _HQQ_REGISTRY["deepseek_v3"] = {
        "config": ds3.DeepseekV3Config.from_hf,
        "forward": ds3.forward,
        "loader": ds3.params_from_hf_state_dict,
    }


def _register_gemma():
    from ..models import gemma as gemma_mod
    from ..models import gemma2 as gemma2_mod

    _HQQ_REGISTRY["gemma"] = {
        "config": gemma_mod.GemmaConfig.from_hf,
        "forward": gemma_mod.forward,
        "loader": hf_loader.params_from_hf_state_dict,
    }
    _HQQ_REGISTRY["gemma2"] = {
        "config": gemma2_mod.Gemma2Config.from_hf,
        "forward": gemma2_mod.forward,
        "loader": gemma2_mod.params_from_hf_state_dict,
    }
    from ..models import gemma3 as gemma3_mod

    _HQQ_REGISTRY["gemma3_text"] = {
        "config": gemma3_mod.Gemma3Config.from_hf,
        "forward": gemma3_mod.forward,
        "loader": gemma3_mod.params_from_hf_state_dict,
    }


_register_mistral()
_register_phi()
_register_qwen2()
_register_qwen3()
_register_code_families()
_register_deepseek3()
_register_gemma()


def _register_mixtral():
    from . import hf as _self  # noqa
    from ..models import mixtral as mixtral_mod

    _HQQ_REGISTRY["mixtral"] = {
        "config": mixtral_mod.MixtralConfig.from_hf,
        "forward": mixtral_mod.forward,
        "loader": mixtral_mod.params_from_hf_state_dict,
    }
    from ..models import qwen3_moe as q3moe_mod

    _HQQ_REGISTRY["qwen3_moe"] = {
        "config": q3moe_mod.Qwen3MoeConfig.from_hf,
        "forward": q3moe_mod.forward,
        "loader": q3moe_mod.params_from_hf_state_dict,
    }
    from ..models import cohere as cohere_mod

    _HQQ_REGISTRY["cohere"] = {
        "config": cohere_mod.CohereConfig.from_hf,
        "forward": cohere_mod.forward,
        "loader": cohere_mod.params_from_hf_state_dict,
    }
    from ..models import gpt_oss as gptoss_mod

    _HQQ_REGISTRY["gpt_oss"] = {
        "config": gptoss_mod.GptOssConfig.from_hf,
        "forward": gptoss_mod.forward,
        "loader": gptoss_mod.params_from_hf_state_dict,
    }
    from ..models import falcon as falcon_mod

    _HQQ_REGISTRY["falcon"] = {
        "config": falcon_mod.FalconConfig.from_hf,
        "forward": falcon_mod.forward,
        "loader": falcon_mod.params_from_hf_state_dict,
    }
    from ..models import gpt2 as gpt2_mod

    _HQQ_REGISTRY["gpt2"] = {
        "config": gpt2_mod.GPT2Config.from_hf,
        "forward": gpt2_mod.forward,
        "loader": gpt2_mod.params_from_hf_state_dict,
    }
    from ..models import bloom as bloom_mod

    _HQQ_REGISTRY["bloom"] = {
        "config": bloom_mod.BloomConfig.from_hf,
        "forward": bloom_mod.forward,
        "loader": bloom_mod.params_from_hf_state_dict,
    }


_register_mixtral()


def register_arch(model_type: str, config, forward, loader) -> None:
    """≙ `HQQWrapper._HQQ_REGISTRY` extension point (ref engine/base.py:13)."""
    _HQQ_REGISTRY[model_type] = {"config": config, "forward": forward, "loader": loader}


@dataclasses.dataclass
class HQQModel:
    params: Any
    cfg: Any
    model_type: str = "llama"
    quantized: bool = False

    @property
    def _arch(self) -> dict:
        return _HQQ_REGISTRY[self.model_type]

    # -- quantization -------------------------------------------------------
    def quantize_model(
        self, quant_config: Optional[dict] = None, compute_dtype=None
    ) -> "HQQModel":
        assert not self.quantized, "model is already quantized"
        self.params = model_base.quantize_model(
            self.params, quant_config or BaseQuantizeConfig(), compute_dtype
        )
        self.quantized = True
        return self

    def prepare_for_inference(
        self, backend: str = "pallas", fuse: bool = False
    ) -> "HQQModel":
        """Swap to a fused backend ("w4a8" is the fast decode path);
        `fuse=True` additionally merges q/k/v and gate/up into wide decode
        matmuls (Llama-family trees incl. gemma2/3 and granite)."""
        from ..utils.patching import fuse_for_decode, prepare_for_inference

        self.params = prepare_for_inference(self.params, backend)
        if fuse:
            self.params = fuse_for_decode(self.params)
        return self

    # -- persistence --------------------------------------------------------
    def save_quantized(self, save_dir: str) -> None:
        assert self.quantized, "quantize_model() first"
        cfg_dict = dataclasses.asdict(self.cfg)
        cfg_cls = type(self.cfg)
        model_base.save_quantized(
            self.params,
            save_dir,
            config={
                "model_type": self.model_type,
                "hf_config": cfg_dict,
                # records the exact dataclass so from_quantized reconstructs
                # it generically for every registered family (no per-family
                # if-chain)
                "config_class": f"{cfg_cls.__module__}.{cfg_cls.__qualname__}",
            },
        )

    # -- inference ----------------------------------------------------------
    def forward(self, tokens, cache=None, start_pos=0):
        return self._arch["forward"](self.params, self.cfg, tokens, cache, start_pos)

    def generate(self, input_ids, max_new_tokens: int = 128, **kw):
        gen = Generator(
            self.params,
            self.cfg,
            forward_fn=lambda p, t, c, s: self._arch["forward"](p, self.cfg, t, c, s),
            **{k: v for k, v in kw.items() if k != "seed"},
        )
        return gen.generate(input_ids, max_new_tokens=max_new_tokens,
                            seed=kw.get("seed", 0))


class HQQModelForCausalLM:
    """Class-method facade matching the reference engine API."""

    @classmethod
    def from_pretrained(
        cls, model_dir: str, compute_dtype=jnp.bfloat16
    ) -> HQQModel:
        with open(os.path.join(model_dir, "config.json")) as f:
            hf_cfg = json.load(f)
        model_type = hf_cfg.get("model_type", "llama")
        arch = _HQQ_REGISTRY.get(model_type)
        assert arch is not None, (
            f"architecture {model_type!r} not supported "
            f"(≙ ref engine/base.py:36 _check_arch_support); "
            f"available: {list(_HQQ_REGISTRY)}"
        )
        cfg = arch["config"](hf_cfg)
        state: dict = {}
        for shard in hf_loader._iter_hf_shards(model_dir):
            state.update(shard)
        params = arch["loader"](state, cfg, compute_dtype)
        return HQQModel(params=params, cfg=cfg, model_type=model_type)

    @classmethod
    def from_quantized(cls, save_dir: str) -> HQQModel:
        params, config = model_base.from_quantized(save_dir)
        model_type = config.get("model_type", "llama")
        arch = _HQQ_REGISTRY[model_type]
        hf_cfg = config.get("hf_config", {})
        # hf_config was produced by dataclasses.asdict on save: reconstruct
        # the dataclass. Resolution order: (1) the exact class recorded in
        # the sidecar, (2) the registry entry's bound `from_hf` owner class,
        # (3) treat `config` as a plain callable on the dict (custom archs).
        cfg = None
        cls_path = config.get("config_class")
        if cls_path:
            import importlib

            try:
                mod_name, _, cls_name = cls_path.rpartition(".")
                cfg = getattr(importlib.import_module(mod_name), cls_name)(**hf_cfg)
            except Exception:  # noqa: BLE001 — fall through to registry
                cfg = None
        if cfg is None:
            owner = getattr(arch["config"], "__self__", None)
            if isinstance(owner, type):
                cfg = owner(**hf_cfg)
            else:
                cfg = arch["config"](hf_cfg)
        return HQQModel(params=params, cfg=cfg, model_type=model_type, quantized=True)

    # convenience passthroughs (≙ HQQWrapper classmethods)
    @staticmethod
    def quantize_model_(model: HQQModel, quant_config=None, compute_dtype=None):
        return model.quantize_model(quant_config, compute_dtype)

    @staticmethod
    def save_quantized_(model: HQQModel, save_dir: str):
        model.save_quantized(save_dir)


AutoHQQHFModel = HQQModelForCausalLM  # ≙ models/hf/base.py:44-46
