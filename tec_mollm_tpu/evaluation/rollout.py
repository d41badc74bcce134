"""Autoregressive rollout: extend forecasts beyond L_out by feeding predictions back.

The reference predicts a fixed 12-step horizon (tec_mollm.py:59-125) and has no
rollout capability; BASELINE.json config 5 calls for "full-year autoregressive
rollout eval". Mechanics:

  1. predict L_out steps from the current window;
  2. convert predictions from target-scaled units back to feature-scaled TEC
     (both scalers are affine, so the conversion is a fused y*a + b on device);
  3. append rows [converted TEC | future space-weather indices] to the window,
     drop the oldest L_out rows, advance the time features;
  4. repeat via lax.scan (single compilation regardless of rollout length).

Exogenous drivers (the 5 space-weather indices) and time features for the future
must be supplied — they are observations, not model outputs.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from tec_mollm_tpu.config import Config
from tec_mollm_tpu.data.scaler import StandardScaler
from tec_mollm_tpu.graph.builder import GraphData


def target_to_feature_affine(
    feature_scaler: StandardScaler | None, target_scaler: StandardScaler | None
) -> tuple[float, float]:
    """y_feature_scaled = a * y_target_scaled + b for the TEC channel (channel 0)."""
    if feature_scaler is None or target_scaler is None:
        return 1.0, 0.0
    t_mean, t_scale = float(target_scaler.mean_[0]), float(target_scaler.scale_[0])
    f_mean, f_scale = float(feature_scaler.mean_[0]), float(feature_scaler.scale_[0])
    return t_scale / f_scale, (t_mean - f_mean) / f_scale


def autoregressive_rollout(
    cfg: Config,
    params: Any,
    graph: GraphData,
    x_init: np.ndarray,        # (B, L_in, N, C) feature-scaled window
    tf_full: np.ndarray,       # (B, L_in + steps, 4) time features incl. future
    sw_future: np.ndarray,     # (B, steps, 5) feature-scaled space-weather indices
    num_steps: int,
    feature_scaler: StandardScaler | None = None,
    target_scaler: StandardScaler | None = None,
) -> np.ndarray:
    """Returns (B, num_steps, N, 1) predictions in target-scaled units."""
    from tec_mollm_tpu.models import TECMoLLM
    from tec_mollm_tpu.models.tec_mollm import graph_inputs

    cfg = cfg.resolved()
    m = cfg.model
    L_in, L_out = m.temporal_seq_len, m.prediction_horizon
    num_chunks = -(-num_steps // L_out)
    total = num_chunks * L_out

    if tf_full.shape[1] < L_in + total:
        raise ValueError(
            f"time features cover {tf_full.shape[1]} steps; rollout needs "
            f"{L_in + total} (L_in + ceil(steps/L_out)*L_out)"
        )
    if sw_future.shape[1] < total:
        raise ValueError(f"space weather covers {sw_future.shape[1]} < {total} steps")

    a, b = target_to_feature_affine(feature_scaler, target_scaler)
    stencil_shifts, (g1, g2) = graph_inputs(graph)
    model = TECMoLLM(
        m,
        dtype=jnp.bfloat16 if cfg.train.bf16 else jnp.float32,
        stencil_shifts=stencil_shifts,
    )

    x0 = jnp.asarray(x_init, jnp.float32)
    tf_dev = jnp.asarray(tf_full[:, : L_in + total], jnp.int32)
    sw_dev = jnp.asarray(sw_future[:, :total], jnp.float32)
    n = x0.shape[2]

    @partial(jax.jit, static_argnames=())
    def run(params, window, tf_dev, sw_dev):
        def chunk(carry, k):
            window = carry
            tf_win = jax.lax.dynamic_slice_in_dim(tf_dev, k * L_out, L_in, axis=1)
            preds = model.apply(
                {"params": params}, window, tf_win, g1, g2, deterministic=True
            )  # (B, L_out, N, Q) target-scaled (Q=1, or quantile levels)
            # feed back (and report) the POINT forecast — the 0.5 level in
            # quantile mode; rolling out the tail levels would compound them
            preds = jax.lax.slice_in_dim(
                preds, m.median_index, m.median_index + 1, axis=-1
            )
            tec_feat = (preds[..., 0] * a + b)  # (B, L_out, N) feature-scaled
            sw_chunk = jax.lax.dynamic_slice_in_dim(sw_dev, k * L_out, L_out, axis=1)
            sw_rows = jnp.broadcast_to(
                sw_chunk[:, :, None, :], sw_chunk.shape[:2] + (n, sw_chunk.shape[-1])
            )
            new_rows = jnp.concatenate([tec_feat[..., None], sw_rows], axis=-1)
            window = jnp.concatenate([window[:, L_out:], new_rows], axis=1)
            return window, preds

        _, chunks = jax.lax.scan(chunk, window, jnp.arange(num_chunks))
        # chunks: (num_chunks, B, L_out, N, 1) -> (B, num_chunks*L_out, N, 1)
        return jnp.moveaxis(chunks, 0, 1).reshape(window.shape[0], total, n, 1)

    preds = run(params, x0, tf_dev, sw_dev)
    return np.asarray(preds[:, :num_steps])
