# SPDX-License-Identifier: Apache-2.0
"""LLaVA-style vision-language model from framework parts (≙ the reference's
LLaVA-1.6 / Qwen2-VL model-zoo scripts): a quantized ViT vision tower, an fp
projector, and a quantized Llama decoder consuming image embeddings as prefix
tokens. Shows that multimodal composition is just pytree + function
composition here — no patching.

Run: PYTHONPATH=. python examples/vlm_demo.py
"""

import numpy as np
import jax
import jax.numpy as jnp

from hqq_tpu.core.quantize import BaseQuantizeConfig
from hqq_tpu.models import LlamaConfig, init_cache, llama, quantize_model, vit
from hqq_tpu.nn import Linear

rng = np.random.default_rng(0)

# --- vision tower: quantized ViT (keeps cls+patch embeddings fp) -----------
vcfg = vit.ViTConfig.tiny()
vparams = vit.init_params(vcfg, jax.random.PRNGKey(0))
vparams = quantize_model(
    vparams, BaseQuantizeConfig(nbits=8, group_size=32), compute_dtype=jnp.float32,
    ignore=("patch_proj", "classifier"),
)

# --- language model: 4-bit Llama -------------------------------------------
lcfg = LlamaConfig.tiny(vocab_size=512)
lparams = llama.init_params(lcfg, jax.random.PRNGKey(1), dtype=jnp.float32)
lparams = quantize_model(
    lparams, BaseQuantizeConfig(nbits=4, group_size=32), compute_dtype=jnp.float32
)

# --- projector: vision hidden -> LM hidden (fp, like LLaVA's mlp2x) --------
key = jax.random.PRNGKey(2)
proj = Linear(
    weight=jax.random.normal(key, (lcfg.hidden_size, vcfg.hidden_size), jnp.float32)
    / np.sqrt(vcfg.hidden_size),
)


def vlm_prefill_and_decode(pixels, prompt_ids, max_new_tokens=8):
    # 1) encode the image; drop the cls token, project patches to LM space
    _, hidden = vit.forward(vparams, vcfg, pixels)
    img_embeds = proj(hidden[:, 1:])  # [B, N_patches, D_lm]

    # 2) embed the text prompt and concatenate [image ; text]
    txt_embeds = jnp.take(lparams["embed_tokens"], prompt_ids, axis=0)
    x = jnp.concatenate([img_embeds, txt_embeds], axis=1)
    b, t = x.shape[:2]

    # 3) run the LM over the multimodal prefix (inputs_embeds bypasses the
    #    token embedding, like HF)
    cache = init_cache(lcfg, batch=b, max_len=64, dtype=jnp.float32)
    logits, cache = llama.forward(
        lparams, lcfg, None, cache, 0, inputs_embeds=x
    )

    # 4) greedy decode continues through the standard cached path
    tok = jnp.argmax(logits[:, -1:], axis=-1).astype(jnp.int32)
    out = [int(tok[0, 0])]
    pos = t
    for _ in range(max_new_tokens - 1):
        logits, cache = llama.forward(lparams, lcfg, tok, cache, pos)
        tok = jnp.argmax(logits[:, -1:], axis=-1).astype(jnp.int32)
        out.append(int(tok[0, 0]))
        pos += 1
    return out


pixels = jnp.asarray(rng.standard_normal((1, 3, 32, 32)).astype(np.float32))
prompt = jnp.asarray([[7, 42, 99]], jnp.int32)
ids = vlm_prefill_and_decode(pixels, prompt)
print("VLM generated ids:", ids)
