# SPDX-License-Identifier: Apache-2.0
"""LLaVA through the paged continuous-batching engine — VL serving.

≙ the reference's LLaVA example + vLLM VLM serving
(`/root/reference/examples/vllm_qwenvl.py` pattern applied to LLaVA):
quantize the language model, encode each request's image once, splice the
features over the placeholder tokens, and serve the resulting
`inputs_embeds` prompts through the SAME engine as text requests.

Runs on CPU or TPU with a tiny random-weight model (checkpoint downloads
are unavailable in this environment); swap `LlavaConfig.tiny()` +
`init_params` for `AutoHQQVLModel.from_pretrained(<hf llava dir>)` to use
real weights.
"""

import numpy as np
import jax
import jax.numpy as jnp

from hqq_tpu.core.quantize import BaseQuantizeConfig
from hqq_tpu.models import base as model_base, llava
from hqq_tpu.serving.paged import PagedBatchingEngine

cfg = llava.LlavaConfig.tiny()
params = llava.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)

# quantize the language model (vision tower + projector stay fp, like the
# reference's LLaVA config). The tiny demo dims force group_size=32; on a
# real checkpoint use the speed mode BaseQuantizeConfig(nbits=4, group_size=64)
params = {**params, "text": model_base.quantize_model(
    params["text"], BaseQuantizeConfig(nbits=4, group_size=32),
    compute_dtype=jnp.float32,
)}

eng = PagedBatchingEngine(
    params["text"], cfg.text, batch_slots=4, num_pages=64, page_size=4,
    max_pages_per_seq=16, cache_dtype=jnp.float32,
)

# three image requests (different images, same prompt template) + plain text
prompt = [5] + [cfg.image_token_index] * cfg.vision.num_patches + [7]
rng = np.random.default_rng(0)
for i in range(3):
    pixels = rng.standard_normal(
        (1, 3, cfg.vision.image_size, cfg.vision.image_size)
    ).astype(np.float32)
    img = llava.vision_forward(params, cfg, jnp.asarray(pixels)).reshape(
        -1, cfg.text.hidden_size
    )
    embeds = llava.embed_multimodal(params, cfg, jnp.asarray([prompt]), img)
    eng.add_request(prompt, max_new_tokens=8, inputs_embeds=np.asarray(embeds[0]))
eng.add_request([5, 9, 7], max_new_tokens=8)  # text-only, same batch

for uid, toks in eng.run().items():
    print(f"request {uid}: {toks}")
eng.close()
