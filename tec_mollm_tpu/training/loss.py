"""Huber loss (reference train.py:372: nn.HuberLoss(delta=1.0), mean reduction)."""

from __future__ import annotations

import jax.numpy as jnp


def huber_loss(
    preds: jnp.ndarray,
    targets: jnp.ndarray,
    delta: float = 1.0,
    weights: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Mean Huber loss. `weights` (broadcastable 0/1 mask) supports padded eval
    batches; with weights the mean runs over weighted elements only."""
    err = preds - targets
    abs_err = jnp.abs(err)
    quadratic = jnp.minimum(abs_err, delta)
    linear = abs_err - quadratic
    elementwise = 0.5 * quadratic**2 + delta * linear
    if weights is None:
        return jnp.mean(elementwise)
    weights = jnp.broadcast_to(weights, elementwise.shape)
    total = jnp.sum(elementwise * weights)
    count = jnp.maximum(jnp.sum(weights), 1.0)
    return total / count
