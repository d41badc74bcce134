"""Cosine annealing with warm restarts, as an optax-compatible schedule.

Behavioral contract: torch.optim.lr_scheduler.CosineAnnealingWarmRestarts(
T_0=10, T_mult=2, eta_min=1e-7) stepped ONCE PER OPTIMIZER UPDATE, exactly like the
reference (train.py:109 steps the scheduler inside the accumulation boundary;
train.py:366 constructs it). So T_0 counts optimizer updates, not epochs.

    lr(t) = eta_min + (base - eta_min) * (1 + cos(pi * T_cur / T_i)) / 2

with cycle lengths T_0, T_0*mult, T_0*mult^2, ... Implemented as a closed-form
jit-friendly function of the update count (closed form for mult >= 2 via log;
linear cycles for mult == 1).
"""

from __future__ import annotations

import jax.numpy as jnp


def cosine_annealing_warm_restarts(
    base_lr: float,
    t_0: int = 10,
    t_mult: int = 2,
    eta_min: float = 1e-7,
):
    """Returns schedule(step) -> lr, matching torch semantics at integer steps."""
    if t_0 <= 0:
        raise ValueError("t_0 must be positive")
    if t_mult < 1:
        raise ValueError("t_mult must be >= 1")

    def schedule(step: jnp.ndarray) -> jnp.ndarray:
        step = jnp.asarray(step, dtype=jnp.float32)
        if t_mult == 1:
            t_cur = jnp.mod(step, t_0)
            t_i = jnp.asarray(t_0, dtype=jnp.float32)
        else:
            # cycle n starts at t_0 * (mult^n - 1) / (mult - 1)
            ratio = step * (t_mult - 1) / t_0 + 1.0
            n = jnp.floor(jnp.log(ratio) / jnp.log(float(t_mult)))
            cycle_start = t_0 * (jnp.power(float(t_mult), n) - 1.0) / (t_mult - 1)
            t_i = t_0 * jnp.power(float(t_mult), n)
            t_cur = step - cycle_start
        return eta_min + (base_lr - eta_min) * 0.5 * (1.0 + jnp.cos(jnp.pi * t_cur / t_i))

    return schedule
