# SPDX-License-Identifier: Apache-2.0
"""HQQ+ training utilities: causal-LM loss + jitted LoRA train step.

The reference delegates adapter training to TRL/peft
(`/root/reference/examples/hqq_plus.py:110-126`); the TPU framework provides
its own minimal, fully-jitted trainer: gradients flow only through the
`TrainableParams` partition (LoRA A/B + optional biases), the frozen
quantized backbone rides along as a regular argument (no gradients are ever
computed for it — `argnums=0` — matching the reference's
input-and-bias-only autograd Functions, ref `core/quantize.py:289-352`).
Works under GSPMD: pass sharded params/batches and the step compiles to a
DP×TP program with gradient reductions inserted automatically.
"""

from __future__ import annotations

from typing import Any, Callable, List, Optional

import jax
import jax.numpy as jnp
from jax import Array

from ..core.peft import TrainableParams
from ..models import llama

__all__ = ["causal_lm_loss", "make_lora_train_step"]


def save_train_state(save_dir: str, train_vals, opt_state, step: int = 0) -> None:
    """Checkpoint trainable leaves + optimizer state (resume support the
    reference delegates to HF Trainer; here it is native, same sharded
    safetensors format as model checkpoints)."""
    from ..models.serialize import save_checkpoint

    flat_opt, opt_tree = jax.tree_util.tree_flatten(opt_state)
    save_checkpoint(
        save_dir,
        {"train_vals": list(train_vals), "opt_flat": flat_opt},
        config={"step": step, "opt_treedef": str(opt_tree)},
    )


def load_train_state(save_dir: str, opt_state_like):
    """Restore (train_vals, opt_state, step); `opt_state_like` provides the
    optimizer-state treedef (e.g. a freshly initialized state)."""
    from ..models.serialize import load_checkpoint

    tree, config = load_checkpoint(save_dir)
    _, opt_tree = jax.tree_util.tree_flatten(opt_state_like)
    opt_state = jax.tree_util.tree_unflatten(opt_tree, tree["opt_flat"])
    return tree["train_vals"], opt_state, int(config.get("step", 0))


def causal_lm_loss(
    params: Any,
    cfg: llama.LlamaConfig,
    tokens: Array,
    loss_mask: Optional[Array] = None,
) -> Array:
    """Next-token cross-entropy over tokens [B, T] (no cache, causal mask)."""
    logits, _ = llama.forward(params, cfg, tokens[:, :-1])
    targets = tokens[:, 1:]
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    if loss_mask is not None:
        m = loss_mask[:, 1:].astype(jnp.float32)
        return (nll * m).sum() / jnp.maximum(m.sum(), 1.0)
    return nll.mean()


def make_lora_train_step(
    cfg: llama.LlamaConfig,
    trainable: TrainableParams,
    optimizer,
    loss_fn: Optional[Callable] = None,
    remat: bool = False,
):
    """Build `(train_vals, opt_state, params, batch) -> (train_vals,
    opt_state, loss)`, jitted. `params` is the full (frozen) tree; the step
    differentiates w.r.t. the trainable leaf list only.

    remat=True wraps the loss in `jax.checkpoint` — activations are
    recomputed in the backward pass instead of stored, trading FLOPs for HBM
    (long sequences / big batches on a 16 GB chip)."""
    loss_fn = loss_fn or causal_lm_loss

    def _loss(train_vals: List[Array], params: Any, batch) -> Array:
        p = trainable.inject(train_vals, params)
        if isinstance(batch, (tuple, list)):
            return loss_fn(p, cfg, *batch)
        return loss_fn(p, cfg, batch)

    if remat:
        _loss = jax.checkpoint(_loss)

    @jax.jit
    def step(train_vals, opt_state, params, batch):
        loss, grads = jax.value_and_grad(_loss, argnums=0)(train_vals, params, batch)
        updates, opt_state = optimizer.update(grads, opt_state, train_vals)
        import optax

        train_vals = optax.apply_updates(train_vals, updates)
        return train_vals, opt_state, loss

    return step
