# SPDX-License-Identifier: Apache-2.0
from .training import causal_lm_loss, make_lora_train_step  # noqa: F401
