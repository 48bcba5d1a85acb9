# SPDX-License-Identifier: Apache-2.0
"""Qwen2-VL through the continuous-batching engine (M-RoPE serving).

≙ `/root/reference/examples/vllm_qwenvl.py` — the reference serves Qwen2-VL
through vLLM's engine; here the SAME dense batching engine serves M-RoPE
requests exactly: explicit prefill position ids + a per-slot decode rope
offset (`qwen2_vl.serving_forward_fns`), token-for-token equal to
single-stream `HQQVLModel.generate`, batched with plain text requests.

Runs on CPU or TPU with a tiny random-weight model; swap the tiny config
for `AutoHQQVLModel.from_pretrained(<hf qwen2-vl dir>)` on real weights.
"""

import numpy as np
import jax
import jax.numpy as jnp

from hqq_tpu.core.quantize import BaseQuantizeConfig
from hqq_tpu.engine.vl import HQQVLModel
from hqq_tpu.models import qwen2_vl
from hqq_tpu.serving.batching import ContinuousBatchingEngine

cfg = qwen2_vl.Qwen2VLConfig.tiny()
params = qwen2_vl.init_params(cfg, jax.random.PRNGKey(1), dtype=jnp.float32)
m = HQQVLModel(params=params, cfg=cfg, model_type="qwen2_vl").quantize_model(
    BaseQuantizeConfig(nbits=4, group_size=16), compute_dtype=jnp.float32
)
text = m.params["text"]

fwd, efwd = qwen2_vl.serving_forward_fns(cfg)
eng = ContinuousBatchingEngine(
    text, cfg.text, batch_slots=4, max_len=64, cache_dtype=jnp.float32,
    forward_fn=fwd, embeds_forward_fn=efwd, mrope_offsets=True,
)

rng = np.random.default_rng(0)
grid = ((1, 4, 4),)  # 16 patches -> 4 merged vision tokens
for i in range(2):
    patches = rng.standard_normal((16, cfg.vision.patch_dim)).astype(np.float32)
    toks = [5, 9 + i] + [cfg.image_token_id] * 4 + [7]
    img = m.encode_images(jnp.asarray(patches), grid)
    emb = qwen2_vl.embed_multimodal(text, cfg, jnp.asarray([toks]), img)
    pos = qwen2_vl.get_mrope_positions(cfg, np.asarray(toks), grid)  # [3,1,T]
    eng.add_request(
        toks, max_new_tokens=8, inputs_embeds=np.asarray(emb[0]),
        position_ids=pos[:, 0], pos_offset=int(pos.max()) + 1 - len(toks),
    )
eng.add_request([5, 9, 7], max_new_tokens=8)  # text-only, same batch

for uid, out in eng.run().items():
    print(f"request {uid}: {out}")
eng.close()
