# SPDX-License-Identifier: Apache-2.0
"""Whisper quantization demo (≙ the reference's Whisper model-zoo example:
encoder and decoder quantized with different configs, then cached decode).

Run: PYTHONPATH=. python examples/whisper_demo.py  [/path/to/hf/whisper]
"""

import sys

import numpy as np
import jax
import jax.numpy as jnp

from hqq_tpu.core.quantize import BaseQuantizeConfig
from hqq_tpu.models import whisper
from hqq_tpu.models.base import iter_linears, name_to_linear_tag, quantize_model

if len(sys.argv) > 1:
    import json, os
    from hqq_tpu.models import hf as hf_loader

    with open(os.path.join(sys.argv[1], "config.json")) as f:
        cfg = whisper.WhisperConfig.from_hf(json.load(f))
    state = {}
    for shard in hf_loader._iter_hf_shards(sys.argv[1]):
        state.update(shard)
    params = whisper.params_from_hf_state_dict(state, cfg)
else:
    cfg = whisper.WhisperConfig.tiny()
    params = whisper.init_params(cfg, jax.random.PRNGKey(0))

# per-tower configs: 8-bit encoder (audio fidelity), 4-bit decoder
tags = {name_to_linear_tag(p) for p, _ in iter_linears(params)}
qcfg = {t: BaseQuantizeConfig(nbits=8 if t.startswith("encoder") else 4,
                              group_size=16)
        for t in tags}
qparams = quantize_model(params, qcfg, compute_dtype=jnp.float32)

rng = np.random.default_rng(0)
mel = jnp.asarray(rng.standard_normal((1, cfg.num_mel_bins, 40)).astype(np.float32))

enc = whisper.encode(qparams, cfg, mel)
cross = whisper.precompute_cross_kv(qparams, cfg, enc)
cache = whisper.init_decoder_cache(cfg, batch=1, max_len=16)

tok = jnp.asarray([[1]], jnp.int32)
decode = jax.jit(lambda p, t, c, pos: whisper.decode(p, cfg, t, cross, c, pos))
out = []
for i in range(8):
    logits, cache = decode(qparams, tok, cache, i)
    tok = jnp.argmax(logits[:, -1:], axis=-1).astype(jnp.int32)
    out.append(int(tok[0, 0]))
print("encoder states:", enc.shape, "| greedy ids:", out)
