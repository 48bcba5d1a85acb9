# SPDX-License-Identifier: Apache-2.0
from . import aria, deepseek3, falcon, gemma, gemma2, gemma3, gpt2, granite, llama, llava, mistral, mixtral, olmo2, phi, qwen2_vl, starcoder2, vit, whisper  # noqa: F401
from . import interop  # noqa: F401
from .base import (  # noqa: F401
    from_quantized,
    get_linear_tags,
    iter_linears,
    name_to_linear_tag,
    patch_linears,
    quantize_model,
    save_quantized,
)
from .hf import load_hf_llama, params_from_hf_state_dict, read_hf_config  # noqa: F401
from .llama import KVCache, LlamaConfig, forward, init_cache, init_params  # noqa: F401
from .serialize import load_checkpoint, save_checkpoint  # noqa: F401
