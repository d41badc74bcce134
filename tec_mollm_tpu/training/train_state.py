"""Functional train state + step functions (fwd/bwd, accumulation, eval).

Replaces the reference's imperative loop body (train.py:50-128): autocast bf16 ->
forward -> Huber/accum -> backward -> (every N steps) unscale/clip/step/zero/sched.
Here the whole macro step — a lax.scan over `accumulation_steps` microbatches with
gradient averaging, followed by one masked AdamW update — is a single jitted,
shardable function. No GradScaler: bf16 on TPU needs no loss scaling
(SURVEY.md §2.d.3).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct

from tec_mollm_tpu.config import Config
from tec_mollm_tpu.training.loss import huber_loss
from tec_mollm_tpu.training.optimizer import build_optimizer


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray            # optimizer updates performed
    params: Any
    opt_state: Any
    rng: jax.Array               # dropout rng, folded per step

    def replace_params(self, params: Any) -> "TrainState":
        return self.replace(params=params)


def create_train_state(
    model, cfg: Config, rng: jax.Array, sample_batch: dict[str, jnp.ndarray],
    graph: tuple[jnp.ndarray, jnp.ndarray],
) -> tuple[TrainState, optax.GradientTransformation, Any]:
    """Initialize params + optimizer. Returns (state, tx, trainable_mask)."""
    init_rng, state_rng = jax.random.split(rng)
    neighbors, neighbor_mask = graph
    params = model.init(
        init_rng,
        sample_batch["x"][:1],
        sample_batch["time_features"][:1],
        neighbors,
        neighbor_mask,
    )["params"]
    tx, mask = build_optimizer(cfg.train, params)
    opt_state = tx.init(params)
    state = TrainState(
        step=jnp.zeros((), dtype=jnp.int32),
        params=params,
        opt_state=opt_state,
        rng=state_rng,
    )
    return state, tx, mask


def _targets_from_batch(batch: dict[str, jnp.ndarray]) -> jnp.ndarray:
    """y (B, N, L_out) -> (B, L_out, N, 1), the model's output layout
    (reference train.py:76 does the same permute on the torch side)."""
    return batch["y"].transpose(0, 2, 1)[..., None]


def make_loss_fn(
    model, cfg: Config, trainable_mask: Any
) -> Callable:
    """loss_fn(params, batch, graph, rng) -> loss. Frozen leaves (mask False) are
    stop_gradient'd so XLA drops their dW matmuls entirely."""

    def loss_fn(params, batch, graph, dropout_rng):
        params = jax.tree.map(
            lambda p, trainable: p if trainable else jax.lax.stop_gradient(p),
            params,
            trainable_mask,
        )
        neighbors, neighbor_mask = graph
        preds = model.apply(
            {"params": params},
            batch["x"],
            batch["time_features"],
            neighbors,
            neighbor_mask,
            deterministic=False,
            rngs={"dropout": dropout_rng},
        )
        return huber_loss(preds, _targets_from_batch(batch), delta=cfg.train.huber_delta)

    return loss_fn


def make_train_step(
    model, cfg: Config, tx: optax.GradientTransformation, trainable_mask: Any
) -> Callable:
    """Returns train_step(state, batch, graph) -> (state, metrics).

    batch arrays have leading dim B_total = accumulation_steps * microbatch; the
    scan averages gradients over microbatches (same semantics as loss/accum +
    per-cycle step in the reference, train.py:78-109 — and, because the scan always
    runs all microbatches, the trailing-remainder flush quirk train.py:117-126
    cannot drop gradients here).
    """
    accum = cfg.train.accumulation_steps
    loss_fn = make_loss_fn(model, cfg, trainable_mask)
    grad_fn = jax.value_and_grad(loss_fn)

    def train_step(state: TrainState, batch: dict[str, jnp.ndarray], graph):
        dropout_rng = jax.random.fold_in(state.rng, state.step)

        if accum > 1:
            def to_micro(x):
                return x.reshape((accum, x.shape[0] // accum) + x.shape[1:])

            micro = jax.tree.map(to_micro, batch)

            def body(carry, mb):
                loss_sum, grad_sum, i = carry
                mb_rng = jax.random.fold_in(dropout_rng, i)
                loss, grads = grad_fn(state.params, mb, graph, mb_rng)
                grad_sum = jax.tree.map(jnp.add, grad_sum, grads)
                return (loss_sum + loss, grad_sum, i + 1), None

            zero_grads = jax.tree.map(jnp.zeros_like, state.params)
            (loss_sum, grad_sum, _), _ = jax.lax.scan(
                body, (jnp.zeros(()), zero_grads, jnp.zeros((), jnp.int32)), micro
            )
            loss = loss_sum / accum
            grads = jax.tree.map(lambda g: g / accum, grad_sum)
        else:
            loss, grads = grad_fn(state.params, batch, graph, dropout_rng)

        # mean gradients across data-parallel replicas happen implicitly: under jit
        # with sharded batch + replicated params, XLA inserts the psum (GSPMD).
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        grad_norm = optax.global_norm(grads)
        new_state = state.replace(
            step=state.step + 1, params=new_params, opt_state=new_opt_state
        )
        return new_state, {"loss": loss, "grad_norm": grad_norm}

    return train_step


def make_eval_step(model, cfg: Config) -> Callable:
    """eval_step(params, batch, graph) -> (loss, preds, targets).

    Handles padded batches via batch['valid'] so stride-1 validation keeps static
    shapes (single compilation); padded rows carry zero loss weight."""

    def eval_step(params, batch: dict[str, jnp.ndarray], graph):
        neighbors, neighbor_mask = graph
        preds = model.apply(
            {"params": params},
            batch["x"],
            batch["time_features"],
            neighbors,
            neighbor_mask,
            deterministic=True,
        )
        targets = _targets_from_batch(batch)
        valid = batch.get("valid")
        if valid is None:
            valid = jnp.ones((preds.shape[0],), dtype=bool)
        w = valid.astype(preds.dtype)[:, None, None, None]
        loss = huber_loss(preds, targets, delta=cfg.train.huber_delta, weights=w)
        return loss, preds, targets

    return eval_step
