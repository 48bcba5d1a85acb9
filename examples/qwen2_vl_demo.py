# SPDX-License-Identifier: Apache-2.0
"""Qwen2-VL multimodal pipeline from framework parts (≙ the reference's
`examples/models/qwen_vl.py` + `examples/vllm_qwenvl.py`, which delegate to
vLLM): quantized 2D-RoPE vision tower -> patch merger -> image embeddings
spliced over placeholder tokens -> quantized Qwen2 text model decoding with
M-RoPE position streams.

Run: PYTHONPATH=. python examples/qwen2_vl_demo.py
"""

import numpy as np
import jax
import jax.numpy as jnp
import jax.random as jr

from hqq_tpu.core.quantize import BaseQuantizeConfig
from hqq_tpu.models import llama, qwen2_vl
from hqq_tpu.models.base import quantize_model
from hqq_tpu.nn import Linear

rng = np.random.default_rng(0)

# --- configs: tiny stand-ins with real-checkpoint structure ----------------
vc = qwen2_vl.VisionConfig(depth=2, embed_dim=64, hidden_size=128, num_heads=4,
                           patch_size=4, mlp_ratio=2)
tc = llama.LlamaConfig.tiny()  # Qwen2 = llama walk + attention biases
cfg = qwen2_vl.Qwen2VLConfig(text=tc, vision=vc, mrope_section=(16, 8, 8),
                             image_token_id=250, vision_start_token_id=249)

# --- random-but-structured weights (a real checkpoint loads through
# qwen2_vl.params_from_hf_state_dict) --------------------------------------
keys = iter(jr.split(jr.PRNGKey(0), 64))
E = vc.embed_dim


def lin(o, i):
    return Linear(weight=jr.normal(next(keys), (o, i), jnp.float32) * 0.05,
                  bias=jnp.zeros((o,), jnp.float32))


vision = {
    "patch_embed": Linear(weight=jr.normal(next(keys), (E, vc.patch_dim),
                                           jnp.float32) * 0.05),
    "blocks": [
        {
            "norm1": {"weight": jnp.ones((E,)), "bias": jnp.zeros((E,))},
            "attn_qkv": lin(3 * E, E),
            "attn_proj": lin(E, E),
            "norm2": {"weight": jnp.ones((E,)), "bias": jnp.zeros((E,))},
            "fc1": lin(E * vc.mlp_ratio, E),
            "fc2": lin(E, E * vc.mlp_ratio),
        }
        for _ in range(vc.depth)
    ],
    "merger_ln_q": {"weight": jnp.ones((E,)), "bias": jnp.zeros((E,))},
    "merger_fc1": lin(4 * E, 4 * E),
    "merger_fc2": lin(tc.hidden_size, 4 * E),
}
text = llama.init_params(tc, jr.PRNGKey(1), jnp.float32)

# --- quantize both towers (vision keeps the patch embed fp) ----------------
vision = quantize_model(vision, BaseQuantizeConfig(nbits=8, group_size=32),
                        compute_dtype=jnp.float32, ignore=("patch_embed",))
text = quantize_model(text, BaseQuantizeConfig(nbits=4, group_size=32),
                      compute_dtype=jnp.float32)

# --- one "image": 4x4 patch grid -> 4 merged vision tokens -----------------
grid = ((1, 4, 4),)
patches = jnp.asarray(rng.standard_normal((16, vc.patch_dim)), jnp.float32)
img_embeds = qwen2_vl.vision_forward(vision, vc, patches, grid)
print("vision tokens:", img_embeds.shape)  # [4, hidden]

# --- prompt with placeholders + M-RoPE positions ---------------------------
IMG = cfg.image_token_id
toks = np.array([[7, cfg.vision_start_token_id, IMG, IMG, IMG, IMG, 23, 45]],
                np.int64)
pos = qwen2_vl.get_mrope_positions(cfg, toks[0], [(1, 4, 4)])
embeds = qwen2_vl.embed_multimodal(text, cfg, jnp.asarray(toks, jnp.int32),
                                   img_embeds)

# --- prefill + greedy decode ----------------------------------------------
cache = qwen2_vl.init_cache(tc, 1, 64, jnp.float32)
logits, cache = qwen2_vl.forward(text, cfg, None, cache, 0,
                                 position_ids=jnp.asarray(pos),
                                 inputs_embeds=embeds)
step = jax.jit(lambda p, t, c, s, pid: qwen2_vl.forward(p, cfg, t, c, s,
                                                        position_ids=pid))
out = [int(jnp.argmax(logits[0, -1]))]
p, mp = toks.shape[1], int(pos.max()) + 1
for _ in range(8):
    logits, cache = step(text, jnp.asarray([[out[-1]]], jnp.int32), cache,
                         jnp.asarray(p), jnp.full((3, 1, 1), mp))
    out.append(int(jnp.argmax(logits[0, -1])))
    p += 1
    mp += 1
print("generated:", out)
