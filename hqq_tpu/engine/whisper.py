# SPDX-License-Identifier: Apache-2.0
"""Whisper engine: quantize / save / load / transcribe for speech
checkpoints (≙ the reference's Whisper example, which quantizes encoder and
decoder with separate HQQ configs and generates through transformers).

The functional family (`models/whisper.py`) supplies encode / cross-KV
precompute / cached decode; this facade adds the persistence and generation
contract the text engine (`engine/hf.py`) and VL engine (`engine/vl.py`)
follow."""

from __future__ import annotations

import dataclasses
import functools
import json
import os
from typing import Any, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..core.quantize import BaseQuantizeConfig
from ..models import base as model_base
from ..models import whisper

__all__ = ["HQQWhisperModel", "AutoHQQWhisperModel"]


@functools.lru_cache(maxsize=None)
def _decode_step_jit(cfg: whisper.WhisperConfig):
    """One jitted decode step per config — a fresh jax.jit(lambda) inside
    transcribe() would re-trace and re-compile on EVERY call (new function
    identity defeats the jit cache); WhisperConfig is frozen/hashable so the
    step compiles once per config across calls and instances."""
    return jax.jit(
        lambda p, t, cr, c, s: whisper.decode(p, cfg, t, cr, c, start_pos=s)
    )


@dataclasses.dataclass
class HQQWhisperModel:
    params: Any
    cfg: whisper.WhisperConfig
    quantized: bool = False

    # -- quantization -------------------------------------------------------
    def quantize_model(
        self,
        quant_config: Optional[dict] = None,
        encoder_config: Optional[dict] = None,
        compute_dtype=None,
    ) -> "HQQWhisperModel":
        """`quant_config` applies to decoder linears, `encoder_config`
        (default: same) to encoder linears — the reference's whisper example
        quantizes the towers with separate configs."""
        assert not self.quantized, "model is already quantized"
        qc = quant_config or BaseQuantizeConfig()
        ec = encoder_config or qc
        tags = set()
        for path, _ in model_base.iter_linears(self.params):
            tags.add(model_base.name_to_linear_tag(path))
        per_tag = {t: (ec if t.startswith("encoder") else qc) for t in tags}
        self.params = model_base.quantize_model(
            self.params, per_tag, compute_dtype
        )
        self.quantized = True
        return self

    def prepare_for_inference(self, backend: str = "pallas") -> "HQQWhisperModel":
        from ..utils.patching import prepare_for_inference

        self.params = prepare_for_inference(self.params, backend)
        return self

    # -- persistence --------------------------------------------------------
    def save_quantized(self, save_dir: str) -> None:
        assert self.quantized, "quantize_model() first"
        model_base.save_quantized(
            self.params,
            save_dir,
            config={
                "model_type": "whisper",
                "whisper_config": dataclasses.asdict(self.cfg),
            },
        )

    # -- inference ----------------------------------------------------------
    def transcribe(
        self,
        mel,
        forced_ids,
        max_new_tokens: int = 64,
        eos_token_id: Optional[int] = None,
        max_len: Optional[int] = None,
    ) -> list:
        """Greedy decode conditioned on `mel` [B=1, n_mels, T_frames]:
        encode once, precompute cross-attention KV, then cached
        self-attention decode from the `forced_ids` prompt (language/task
        tokens, ≙ HF forced_decoder_ids)."""
        cfg = self.cfg
        toks = np.asarray(forced_ids, np.int32).reshape(1, -1)
        t0 = toks.shape[1]
        n = max_len or min(
            cfg.max_target_positions,
            1 << int(np.ceil(np.log2(t0 + max_new_tokens + 1))),
        )

        enc = whisper.encode(self.params, cfg, jnp.asarray(mel))
        cross = whisper.precompute_cross_kv(self.params, cfg, enc)
        cache = whisper.init_decoder_cache(cfg, batch=1, max_len=n)
        logits, cache = whisper.decode(
            self.params, cfg, jnp.asarray(toks), cross, cache, start_pos=0
        )
        step = _decode_step_jit(cfg)
        out = [int(jnp.argmax(logits[0, t0 - 1]))]
        pos = t0
        for _ in range(max_new_tokens - 1):
            if eos_token_id is not None and out[-1] == eos_token_id:
                break
            if pos >= n - 1:
                break
            logits, cache = step(
                self.params, jnp.asarray([[out[-1]]], jnp.int32), cross, cache,
                jnp.asarray(pos),
            )
            out.append(int(jnp.argmax(logits[0, -1])))
            pos += 1
        return out


class AutoHQQWhisperModel:
    """from_pretrained / from_quantized facade for Whisper checkpoints."""

    @classmethod
    def from_pretrained(
        cls, model_dir: str, compute_dtype=jnp.float32
    ) -> HQQWhisperModel:
        from ..models import hf as hf_loader

        with open(os.path.join(model_dir, "config.json")) as f:
            hf_cfg = json.load(f)
        assert hf_cfg.get("model_type") == "whisper", (
            f"not a whisper checkpoint: {hf_cfg.get('model_type')!r}"
        )
        cfg = whisper.WhisperConfig.from_hf(hf_cfg)
        state: dict = {}
        for shard in hf_loader._iter_hf_shards(model_dir):
            state.update(shard)
        params = whisper.params_from_hf_state_dict(state, cfg, compute_dtype)
        return HQQWhisperModel(params=params, cfg=cfg)

    @classmethod
    def from_quantized(cls, save_dir: str) -> HQQWhisperModel:
        params, config = model_base.from_quantized(save_dir)
        return HQQWhisperModel(
            params=params,
            cfg=whisper.WhisperConfig(**config["whisper_config"]),
            quantized=True,
        )
