# SPDX-License-Identifier: Apache-2.0
"""Vision-model engine: quantize / save / load for ViT-class models.

≙ `HQQtimm` (`/root/reference/hqq/engine/timm.py:22`) — which is DEAD CODE in
the reference (it imports `..models.timm.vit_clip`, a module that does not
exist; SURVEY §2.8). This is the working TPU equivalent over the functional
ViT in `hqq_tpu.models.vit`.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Optional

import jax.numpy as jnp

from ..core.quantize import BaseQuantizeConfig
from ..models import base as model_base
from ..models import vit as vit_mod

__all__ = ["HQQVisionModel", "AutoHQQVisionModel", "HQQtimm"]

_VISION_REGISTRY = {
    "vit": {
        "config": vit_mod.ViTConfig.from_hf,
        "config_cls": vit_mod.ViTConfig,
        "forward": vit_mod.forward,
        "loader": vit_mod.params_from_hf_state_dict,
    },
}


@dataclasses.dataclass
class HQQVisionModel:
    params: Any
    cfg: Any
    model_type: str = "vit"
    quantized: bool = False

    def quantize_model(
        self, quant_config: Optional[dict] = None, compute_dtype=None
    ) -> "HQQVisionModel":
        assert not self.quantized, "model is already quantized"
        # patch_proj / classifier stay fp (like lm_head in the LLM families)
        self.params = model_base.quantize_model(
            self.params,
            quant_config or BaseQuantizeConfig(),
            compute_dtype,
            ignore=("patch_proj", "classifier", "lm_head"),
        )
        self.quantized = True
        return self

    def prepare_for_inference(self, backend: str = "pallas") -> "HQQVisionModel":
        from ..utils.patching import prepare_for_inference

        self.params = prepare_for_inference(self.params, backend)
        return self

    def save_quantized(self, save_dir: str) -> None:
        assert self.quantized, "quantize_model() first"
        model_base.save_quantized(
            self.params,
            save_dir,
            config={
                "model_type": self.model_type,
                "hf_config": dataclasses.asdict(self.cfg),
            },
        )

    def forward(self, pixels, pool: str = "cls"):
        return _VISION_REGISTRY[self.model_type]["forward"](
            self.params, self.cfg, pixels, pool
        )

    __call__ = forward


class AutoHQQVisionModel:
    """from_pretrained / from_quantized facade for vision checkpoints."""

    @classmethod
    def from_pretrained(cls, model_dir: str, compute_dtype=jnp.float32) -> HQQVisionModel:
        from ..models import hf as hf_loader

        with open(os.path.join(model_dir, "config.json")) as f:
            hf_cfg = json.load(f)
        model_type = hf_cfg.get("model_type", "vit")
        arch = _VISION_REGISTRY.get(model_type)
        assert arch is not None, (
            f"vision architecture {model_type!r} not supported; "
            f"available: {list(_VISION_REGISTRY)}"
        )
        cfg = arch["config"](hf_cfg)
        state: dict = {}
        for shard in hf_loader._iter_hf_shards(model_dir):
            state.update(shard)
        params = arch["loader"](state, cfg, compute_dtype)
        return HQQVisionModel(params=params, cfg=cfg, model_type=model_type)

    @classmethod
    def from_quantized(cls, save_dir: str) -> HQQVisionModel:
        params, config = model_base.from_quantized(save_dir)
        model_type = config.get("model_type", "vit")
        cfg = _VISION_REGISTRY[model_type]["config_cls"](**config.get("hf_config", {}))
        return HQQVisionModel(params=params, cfg=cfg, model_type=model_type, quantized=True)


# Back-compat alias matching the reference class name.
HQQtimm = AutoHQQVisionModel
