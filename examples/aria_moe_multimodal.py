# SPDX-License-Identifier: Apache-2.0
"""Aria: grouped-expert MoE vision-language model, quantized and generating
(≙ the reference's Aria path, `/root/reference/hqq/utils/aria.py:178-311` +
`examples/models/aria_multimodal.py`): attention + shared experts quantize as
ordinary HQQ linears, the grouped expert stacks quantize into
`GroupedQuantLinear` (the `HQQGroupedGemm` role), and the Idefics3 vision
tower + cross-attention projector stay fp — the reference's exact placement.

Run: PYTHONPATH=. python examples/aria_moe_multimodal.py
"""

import numpy as np
import jax
import jax.numpy as jnp

from hqq_tpu.core.quantize import BaseQuantizeConfig
from hqq_tpu.models import aria

cfg = aria.AriaConfig.tiny()
params = aria.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)

# quantize: 4-bit attention + shared experts, 4-bit grouped expert stacks
params = aria.quantize_aria(
    params,
    attn_config=BaseQuantizeConfig(nbits=4, group_size=32),
    expert_config=BaseQuantizeConfig(nbits=4, group_size=16),
    compute_dtype=jnp.float32,
)
from hqq_tpu.nn.moe import GroupedQuantLinear

assert isinstance(
    params["text"]["layers"][0]["mlp"]["experts"]["fc1"], GroupedQuantLinear
)

# image -> queries -> spliced prompt -> prefill + decode
rng = np.random.default_rng(0)
vc = cfg.vision
pixels = jnp.asarray(rng.standard_normal(
    (1, vc.num_channels, vc.image_size, vc.image_size)).astype(np.float32))
img = aria.vision_forward(params, cfg, pixels)  # [1, query_num, d]
query_num = img.shape[1]
print(f"projector queries: {query_num} x {img.shape[-1]}")

prompt = [5, 8] + [cfg.image_token_index] * query_num + [11, 3]
toks = jnp.asarray([prompt], jnp.int32)
embeds = aria.embed_multimodal(params, cfg, toks,
                               img.reshape(-1, cfg.text.hidden_size))

cache = aria.init_cache(cfg, batch=1, max_len=32, dtype=jnp.float32)
logits, cache = aria.forward(params, cfg, None, cache, 0, inputs_embeds=embeds)
out = [int(jnp.argmax(logits[0, -1]))]
pos = toks.shape[1]
step = jax.jit(lambda p, t, c, s: aria.forward(p, cfg, t, c, s))
for _ in range(7):
    logits, cache = step(params, jnp.asarray([[out[-1]]], jnp.int32), cache,
                         jnp.asarray(pos))
    out.append(int(jnp.argmax(logits[0, -1])))
    pos += 1
print("generated:", out)
