"""Functional train state + step functions (fwd/bwd, accumulation, eval).

Replaces the reference's imperative loop body (train.py:50-128): autocast bf16 ->
forward -> Huber/accum -> backward -> (every N steps) unscale/clip/step/zero/sched.
Here the whole macro step — a lax.scan over `accumulation_steps` microbatches with
gradient averaging, followed by one AdamW update — is a single jitted, shardable
function. No GradScaler: bf16 on TPU needs no loss scaling (SURVEY.md §2.d.3).

Partitioned parameters: the reference freezes the GPT-2 base weights and optimizes
only lora_/ln_/wpe + non-LLM modules (modules.py:195-203, train.py:358-362). Here
that split is structural — TrainState holds a `trainable` tree (differentiated,
optimized, fp32) and a `frozen` tree (constants to the graph; storable in bf16).
Gradients, optimizer moments, the accumulation carry, and the global-norm clip all
touch ONLY the trainable tree (~3M params instead of ~24M).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct

from tec_mollm_tpu.config import Config
from tec_mollm_tpu.training.loss import huber_loss, pinball_loss
from tec_mollm_tpu.training.optimizer import build_optimizer, trainable_mask


def _is_none(x) -> bool:
    return x is None


def partition_params(params: Any, mask: Any) -> tuple[Any, Any]:
    """Split a param tree into (trainable, frozen) trees with None placeholders."""
    trainable = jax.tree.map(lambda p, m: p if m else None, params, mask)
    frozen = jax.tree.map(lambda p, m: None if m else p, params, mask)
    return trainable, frozen


def merge_params(trainable: Any, frozen: Any) -> Any:
    """Inverse of partition_params."""
    return jax.tree.map(
        lambda t, f: f if t is None else t, trainable, frozen, is_leaf=_is_none
    )


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray            # optimizer updates performed
    trainable: Any               # differentiated + optimized params (fp32)
    frozen: Any                  # frozen params (None placeholders in trainable)
    opt_state: Any
    rng: jax.Array               # dropout rng, folded per step
    # exponential moving average of `trainable` when TrainConfig.ema_decay > 0,
    # else None (keeps the pytree structure — and old checkpoints — unchanged
    # for non-EMA runs)
    ema: Any = None

    @property
    def params(self) -> Any:
        """Merged full parameter tree (for eval / checkpoint / inspection)."""
        return merge_params(self.trainable, self.frozen)

    @property
    def eval_params(self) -> Any:
        """Parameters evaluation should use: the EMA weights when tracked
        (validation/best-checkpoint selection on the averaged model is the
        point of EMA), else the raw weights."""
        src = self.trainable if self.ema is None else self.ema
        return merge_params(src, self.frozen)


def create_train_state(
    model,
    cfg: Config,
    rng: jax.Array,
    sample_batch: dict[str, jnp.ndarray],
    graph: tuple[jnp.ndarray, jnp.ndarray],
    frozen_dtype: jnp.dtype | None = None,
) -> tuple[TrainState, optax.GradientTransformation, Any]:
    """Initialize params + optimizer. Returns (state, tx, mask).

    frozen_dtype (e.g. bf16) downcasts the frozen tree — halves its HBM footprint
    and weight-streaming bandwidth; trainable params stay fp32 for AdamW.
    """
    init_rng, state_rng = jax.random.split(rng)
    neighbors, neighbor_mask = graph
    params = model.init(
        init_rng,
        sample_batch["x"][:1],
        sample_batch["time_features"][:1],
        neighbors,
        neighbor_mask,
    )["params"]
    mask = trainable_mask(params)
    trainable, frozen = partition_params(params, mask)
    if frozen_dtype is not None:
        frozen = jax.tree.map(lambda p: p.astype(frozen_dtype), frozen)
    tx = build_optimizer(cfg.train)
    opt_state = tx.init(trainable)
    state = TrainState(
        step=jnp.zeros((), dtype=jnp.int32),
        trainable=trainable,
        frozen=frozen,
        opt_state=opt_state,
        rng=state_rng,
        # EMA starts AT the initial weights (not zeros): no debiasing term, and
        # an eval before any update sees exactly the raw model
        ema=jax.tree.map(jnp.copy, trainable) if cfg.train.ema_decay > 0 else None,
    )
    return state, tx, mask


def _targets_from_batch(batch: dict[str, jnp.ndarray]) -> jnp.ndarray:
    """y (B, N, L_out) -> (B, L_out, N, 1), the model's output layout
    (reference train.py:76 does the same permute on the torch side)."""
    return batch["y"].transpose(0, 2, 1)[..., None]


def _objective(preds, targets, cfg: Config, weights=None):
    """Training/eval objective: Huber on the point forecast (reference
    train.py:372), or mean pinball across levels in quantile mode."""
    if cfg.model.quantiles:
        return pinball_loss(preds, targets, cfg.model.quantiles, weights=weights)
    return huber_loss(preds, targets, delta=cfg.train.huber_delta, weights=weights)


def point_forecast(preds: jnp.ndarray, cfg: Config) -> jnp.ndarray:
    """(B, L_out, N, Q) -> (B, L_out, N, 1) point forecast — identity for the
    deterministic model, the 0.5-level slice in quantile mode. Downstream
    consumers (streaming metrics, rollout feedback, forecast CSVs) all operate
    on this."""
    q = cfg.model.median_index
    return jax.lax.slice_in_dim(preds, q, q + 1, axis=-1)


def make_loss_fn(model, cfg: Config) -> Callable:
    """loss_fn(trainable, frozen, batch, graph, rng) -> loss (weighted mean).

    batch['valid'] (when present) loss-masks padded rows: the final macro
    batch of an epoch is padded to full size with repeats instead of dropped,
    so every train window contributes a gradient each epoch — the effective
    semantics of the reference's trailing-accumulation flush (train.py:117-126,
    SURVEY §2.d.4). Rows with valid=False carry zero weight and the mean runs
    over valid rows only."""

    def loss_fn(trainable, frozen, batch, graph, dropout_rng):
        params = merge_params(trainable, frozen)
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
        valid = batch.get("valid")
        w = None if valid is None else valid.astype(preds.dtype)[:, None, None, None]
        return _objective(preds, _targets_from_batch(batch), cfg, weights=w)

    return loss_fn


def make_sum_loss_fn(model, cfg: Config) -> Callable:
    """loss_fn(...) -> (weighted SUM of elementwise objective, weight count).

    The train step's form: accumulating (sum, count) across microbatches and
    dividing ONCE yields the exact valid-weighted global mean of the macro
    batch, identical for every partition of the rows into microbatches or
    process shards. Per-microbatch means averaged equally (the naive form)
    are partition-DEPENDENT as soon as a padded remainder makes valid counts
    unequal across microbatches — caught by the 2-process-vs-1-process parity
    test. On full batches sum/count equals mean-of-means exactly."""
    from tec_mollm_tpu.training.loss import huber_elementwise, pinball_elementwise

    def loss_fn(trainable, frozen, batch, graph, dropout_rng):
        params = merge_params(trainable, frozen)
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
        targets = _targets_from_batch(batch)
        if cfg.model.quantiles:
            elem = pinball_elementwise(preds, targets, cfg.model.quantiles)
        else:
            elem = huber_elementwise(preds, targets, delta=cfg.train.huber_delta)
        valid = batch.get("valid")
        w = (
            jnp.ones((preds.shape[0],), elem.dtype)
            if valid is None
            else valid.astype(elem.dtype)
        )
        wb = jnp.broadcast_to(w[:, None, None, None], elem.shape)
        return jnp.sum(elem * wb), jnp.sum(wb)

    return loss_fn


def make_train_step(
    model, cfg: Config, tx: optax.GradientTransformation, gather: bool = False
) -> Callable:
    """Returns train_step(state, batch, graph[, data]) -> (state, metrics).

    batch arrays have leading dim B_total = accumulation_steps * microbatch; the
    scan averages gradients over microbatches (same semantics as loss/accum +
    per-cycle step in the reference, train.py:78-109; the trailing-remainder
    flush quirk train.py:117-126 is covered by the loss-masked final padded
    batch — see make_loss_fn). Gradients exist only for the trainable tree.

    gather=True is the device-resident path (data/device_data.py): batch is
    {'starts' (B_total,), 'valid' (B_total,)} and `data` a DeviceSplit; each
    microbatch is gathered from HBM inside the scan body, so windows are never
    materialized beyond one microbatch and nothing streams from the host.
    """
    accum = cfg.train.accumulation_steps
    # weighted-SUM objective + one division by the macro batch's total valid
    # weight: the exact global mean, invariant to how rows are partitioned
    # into microbatches or process shards (see make_sum_loss_fn)
    loss_fn = make_sum_loss_fn(model, cfg)
    grad_fn = jax.value_and_grad(loss_fn, argnums=0, has_aux=True)

    def train_step(state: TrainState, batch: dict[str, jnp.ndarray], graph, data=None):
        dropout_rng = jax.random.fold_in(state.rng, state.step)

        def resolve(mb):
            return data.gather(mb["starts"], mb.get("valid")) if gather else mb

        if accum > 1:
            def to_micro(x):
                return x.reshape((accum, x.shape[0] // accum) + x.shape[1:])

            micro = jax.tree.map(to_micro, batch)

            def body(carry, mb):
                loss_sum, count_sum, grad_sum, i = carry
                mb_rng = jax.random.fold_in(dropout_rng, i)
                (wsum, count), grads = grad_fn(
                    state.trainable, state.frozen, resolve(mb), graph, mb_rng
                )
                grad_sum = jax.tree.map(jnp.add, grad_sum, grads)
                return (loss_sum + wsum, count_sum + count, grad_sum, i + 1), None

            zero_grads = jax.tree.map(jnp.zeros_like, state.trainable)
            (loss_sum, count_sum, grad_sum, _), _ = jax.lax.scan(
                body,
                (jnp.zeros(()), jnp.zeros(()), zero_grads, jnp.zeros((), jnp.int32)),
                micro,
            )
        else:
            (loss_sum, count_sum), grad_sum = grad_fn(
                state.trainable, state.frozen, resolve(batch), graph, dropout_rng
            )
        denom = jnp.maximum(count_sum, 1.0)
        loss = loss_sum / denom
        grads = jax.tree.map(lambda g: g / denom, grad_sum)

        # mean gradients across data-parallel replicas happen implicitly: under jit
        # with sharded batch + replicated params, XLA inserts the psum (GSPMD).
        updates, new_opt_state = tx.update(grads, state.opt_state, state.trainable)
        new_trainable = optax.apply_updates(state.trainable, updates)
        grad_norm = optax.global_norm(grads)
        new_ema = state.ema
        if cfg.train.ema_decay > 0:
            d = cfg.train.ema_decay
            new_ema = jax.tree.map(
                lambda e, p: e * d + p.astype(e.dtype) * (1.0 - d),
                state.ema, new_trainable,
            )
        new_state = state.replace(
            step=state.step + 1, trainable=new_trainable, opt_state=new_opt_state,
            ema=new_ema,
        )
        return new_state, {"loss": loss, "grad_norm": grad_norm}

    return train_step


def make_eval_step(model, cfg: Config, gather: bool = False) -> Callable:
    """eval_step(params, batch, graph[, data]) -> (loss, preds, targets).

    Takes the MERGED param tree. Handles padded batches via batch['valid'] so
    stride-1 validation keeps static shapes (single compilation); padded rows carry
    zero loss weight. In quantile mode `preds` carries all levels on the last
    axis (B, L_out, N, Q) and the loss is pinball (matching the training
    objective, so best-checkpoint selection optimizes the same thing); use
    `point_forecast` for the 0.5-level slice. gather=True mirrors
    make_train_step's device-resident path ({'starts','valid'} + DeviceSplit)."""

    def eval_step(params, batch: dict[str, jnp.ndarray], graph, data=None):
        if gather:
            batch = data.gather(batch["starts"], batch.get("valid"))
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
        loss = _objective(preds, targets, cfg, weights=w)
        return loss, preds, targets

    return eval_step
