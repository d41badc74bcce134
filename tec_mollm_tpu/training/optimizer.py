"""Optimizer: AdamW over trainable parameters only, with grad clipping and the
warm-restart schedule.

Behavioral contract (reference train.py:355-372 + modules.py:195-203):
  * AdamW(lr, weight_decay=1e-2) over parameters with requires_grad — i.e. all
    non-LLM modules plus the LLM's `lora_`, `ln_`, and `wpe` parameters; torch AdamW
    decays every given parameter (including LayerNorm scales and biases), so no
    decay mask is applied beyond the trainable mask;
  * clip_grad_norm_(1.0) before the update (train.py:97);
  * CosineAnnealingWarmRestarts stepped per update (schedule.py).

Frozen parameters receive zero updates via optax.masked; they also get
stop_gradient'd in the loss so no memory/compute is spent on their gradients.
"""

from __future__ import annotations

from typing import Any

import jax
import optax

from tec_mollm_tpu.config import TrainConfig
from tec_mollm_tpu.training.schedule import cosine_annealing_warm_restarts

# LLM parameters that stay trainable (reference unfreeze policy, modules.py:201-203):
# any path containing lora_, a layernorm (ln_1/ln_2/ln_f -> leaf under ln_*), or wpe.
_TRAINABLE_LLM_TOKENS = ("lora_A", "lora_B", "ln_1", "ln_2", "ln_f", "wpe")


def _path_tokens(path: tuple) -> list[str]:
    toks = []
    for p in path:
        if hasattr(p, "key"):
            toks.append(str(p.key))
        elif hasattr(p, "name"):
            toks.append(str(p.name))
        else:
            toks.append(str(p))
    return toks


def is_trainable(path: tuple, llm_module_name: str = "llm") -> bool:
    toks = _path_tokens(path)
    if llm_module_name not in toks:
        return True  # everything outside the LLM trains
    return any(t in toks for t in _TRAINABLE_LLM_TOKENS)


def trainable_mask(params: Any, llm_module_name: str = "llm") -> Any:
    """Pytree of bools marking trainable leaves (mirrors requires_grad filtering,
    reference train.py:358-362)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, _: is_trainable(path, llm_module_name), params
    )


def build_optimizer(train_cfg: TrainConfig) -> optax.GradientTransformation:
    """AdamW + clip + warm-restart schedule, applied to the TRAINABLE tree only
    (the frozen tree is split off structurally — see train_state.partition_params —
    so no optax.masked indirection is needed). The schedule's step count equals the
    number of optimizer updates (one per accumulated macro step), matching the
    reference's scheduler.step() placement."""
    schedule = cosine_annealing_warm_restarts(
        base_lr=train_cfg.lr,
        t_0=train_cfg.sched_t0,
        t_mult=train_cfg.sched_t_mult,
        eta_min=train_cfg.sched_eta_min,
    )
    tx = optax.chain(
        optax.clip_by_global_norm(train_cfg.clip_grad_norm),
        optax.adamw(
            learning_rate=schedule,
            b1=0.9,
            b2=0.999,
            eps=1e-8,
            weight_decay=train_cfg.weight_decay,
        ),
    )
    if getattr(train_cfg, "flatten_optimizer", True) and train_cfg.model_parallel == 1:
        # One flat fp32 vector instead of ~80 leaves: same math, but the whole
        # clip+AdamW update compiles to a few large fused kernels instead of
        # hundreds of microscopic ones (measured 8.8 ms -> sub-ms on v5e at the
        # default config). Skipped under TP: flattening TP-sharded leaves (lora_B)
        # would insert an all-gather into every update.
        tx = optax.flatten(tx)
    return tx
