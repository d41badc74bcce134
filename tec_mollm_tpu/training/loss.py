"""Losses: Huber (reference train.py:372: nn.HuberLoss(delta=1.0), mean
reduction) and pinball/quantile loss for the beyond-reference probabilistic
head (ModelConfig.quantiles)."""

from __future__ import annotations

import jax.numpy as jnp


def huber_elementwise(
    preds: jnp.ndarray, targets: jnp.ndarray, delta: float = 1.0
) -> jnp.ndarray:
    err = preds - targets
    abs_err = jnp.abs(err)
    quadratic = jnp.minimum(abs_err, delta)
    linear = abs_err - quadratic
    return 0.5 * quadratic**2 + delta * linear


def huber_loss(
    preds: jnp.ndarray,
    targets: jnp.ndarray,
    delta: float = 1.0,
    weights: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Mean Huber loss. `weights` (broadcastable 0/1 mask) supports padded eval
    batches; with weights the mean runs over weighted elements only."""
    elementwise = huber_elementwise(preds, targets, delta)
    if weights is None:
        return jnp.mean(elementwise)
    weights = jnp.broadcast_to(weights, elementwise.shape)
    total = jnp.sum(elementwise * weights)
    count = jnp.maximum(jnp.sum(weights), 1.0)
    return total / count


def pinball_elementwise(
    preds: jnp.ndarray, targets: jnp.ndarray, quantiles: tuple[float, ...]
) -> jnp.ndarray:
    q = jnp.asarray(quantiles, preds.dtype)  # (Q,)
    err = targets - preds                    # (..., Q) via broadcast
    return jnp.maximum(q * err, (q - 1.0) * err)


def pinball_loss(
    preds: jnp.ndarray,
    targets: jnp.ndarray,
    quantiles: tuple[float, ...],
    weights: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Mean pinball (quantile) loss.

    preds: (..., Q) one forecast per quantile level; targets: (..., 1),
    broadcast against every level. Per level q and error e = y - p:
    loss = max(q*e, (q-1)*e). `weights` is a broadcastable 0/1 mask like
    huber_loss's (padded eval rows); the mean runs over weighted elements
    and averages across levels.
    """
    elementwise = pinball_elementwise(preds, targets, quantiles)
    if weights is None:
        return jnp.mean(elementwise)
    weights = jnp.broadcast_to(weights, elementwise.shape)
    total = jnp.sum(elementwise * weights)
    count = jnp.maximum(jnp.sum(weights), 1.0)
    return total / count
