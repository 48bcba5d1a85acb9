# SPDX-License-Identifier: Apache-2.0
"""WikiText-2 perplexity harness (≙ reference
`examples/llama2_benchmark/eval_model.py:12-52`): sliding window
max_length=1024, stride=512, ppl = exp(sum(ll)/end_loc).

With a local checkpoint + tokenized text file (one long token stream, .npy):
    PYTHONPATH=. python examples/ppl_eval.py /path/to/model tokens.npy
Without arguments it sanity-checks the protocol on a tiny random model
(fp vs 4-bit vs 2-bit PPL ordering).
"""

import sys

import numpy as np
import jax
import jax.numpy as jnp

from hqq_tpu.core.quantize import BaseQuantizeConfig
from hqq_tpu.models import LlamaConfig, init_params, quantize_model
from hqq_tpu.utils.eval import perplexity

if len(sys.argv) > 2:
    from hqq_tpu.engine.hf import HQQModelForCausalLM

    model = HQQModelForCausalLM.from_pretrained(sys.argv[1])
    model.quantize_model(BaseQuantizeConfig(nbits=4, group_size=64))
    tokens = np.load(sys.argv[2])
    ppl = perplexity(model.params, model.cfg, jnp.asarray(tokens, jnp.int32),
                     max_length=1024, stride=512)
    print(f"wikitext2 ppl (4-bit g64): {ppl:.4f}")
else:
    cfg = LlamaConfig.tiny(vocab_size=512)
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (4096,)), jnp.int32)

    ppl_fp = perplexity(params, cfg, tokens, max_length=256, stride=128)
    for nbits in (4, 2):
        q = quantize_model(params, BaseQuantizeConfig(nbits=nbits, group_size=32),
                           compute_dtype=jnp.float32)
        ppl_q = perplexity(q, cfg, tokens, max_length=256, stride=128)
        print(f"ppl fp={ppl_fp:.3f}  {nbits}-bit={ppl_q:.3f}  "
              f"(delta {ppl_q - ppl_fp:+.3f})")
