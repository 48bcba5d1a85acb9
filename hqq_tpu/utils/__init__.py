# SPDX-License-Identifier: Apache-2.0
from .eval import loglikelihood, perplexity  # noqa: F401
from .patching import auto_mix_plan, merge_zeros_into_lora, prepare_for_inference  # noqa: F401
from .training import causal_lm_loss, make_lora_train_step  # noqa: F401
