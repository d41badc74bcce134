"""Streaming (on-device) metric evaluation.

The reference's validation materializes every prediction on the host and
concatenates before computing metrics (train.py:153-164) — at stride-1 over years
of data that is gigabytes of device->host traffic and host RAM. Here each eval
batch reduces to 8 sufficient statistics per horizon ON DEVICE (a 12x8 readback per
batch), and the host finalizes MAE/RMSE/R^2/Pearson exactly:

    n, sum|e|, sum e^2, sum y, sum y^2, sum p, sum p^2, sum y*p

computed on inverse-transformed values with the reference's guard/clip semantics
(metrics.py:41-52: nan_to_num with +inf->100 after inverse transform, predictions
clipped to [0, 200], truths not clipped; scaled non-finite predictions zeroed
first, metrics.py:137-144). Accumulation across batches happens in float64 on the
host, so the result matches evaluation/metrics.py bit-for-bit within fp32 rounding
of the per-batch sums.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from tec_mollm_tpu.data.scaler import StandardScaler
from tec_mollm_tpu.evaluation.metrics import TEC_MAX, TEC_MIN

NUM_STATS = 8


def scaler_affine(scaler: StandardScaler | None) -> tuple[float, float]:
    """inverse_transform(x) = x * scale + mean for the single target channel."""
    if scaler is None:
        return 1.0, 0.0
    return float(scaler.scale_[0]), float(scaler.mean_[0])


@partial(jax.jit, static_argnames=())
def batch_metric_stats(
    y_true_scaled: jnp.ndarray,  # (B, L_out, ...) scaled
    y_pred_scaled: jnp.ndarray,
    valid: jnp.ndarray,          # (B,) bool
    scale: jnp.ndarray,          # () target-scaler scale
    mean: jnp.ndarray,           # () target-scaler mean
) -> jnp.ndarray:
    """-> (L_out, 8) float32 per-horizon sufficient statistics."""
    l_out = y_true_scaled.shape[1]
    yt = y_true_scaled.reshape(y_true_scaled.shape[0], l_out, -1).astype(jnp.float32)
    yp = y_pred_scaled.reshape(y_pred_scaled.shape[0], l_out, -1).astype(jnp.float32)

    # guard scaled predictions (metrics.py:137-144)
    yp = jnp.nan_to_num(yp, nan=0.0, posinf=0.0, neginf=0.0)
    # inverse transform
    yt = yt * scale + mean
    yp = yp * scale + mean
    # post-inverse guards (metrics.py:41-47) + physical clip (preds only, :51-52)
    yt = jnp.nan_to_num(yt, nan=0.0, posinf=100.0, neginf=0.0)
    yp = jnp.clip(jnp.nan_to_num(yp, nan=0.0, posinf=100.0, neginf=0.0),
                  TEC_MIN, TEC_MAX)

    w = valid.astype(jnp.float32)[:, None, None]
    err = (yp - yt) * w
    yt_w = yt * w
    yp_w = yp * w
    n = jnp.sum(w) * yt.shape[-1]
    stats = jnp.stack(
        [
            jnp.full((l_out,), n),
            jnp.sum(jnp.abs(err), axis=(0, 2)),
            jnp.sum(err**2, axis=(0, 2)),
            jnp.sum(yt_w, axis=(0, 2)),
            jnp.sum(yt_w**2, axis=(0, 2)),
            jnp.sum(yp_w, axis=(0, 2)),
            jnp.sum(yp_w**2, axis=(0, 2)),
            jnp.sum(yt_w * yp_w, axis=(0, 2)),
        ],
        axis=-1,
    )
    return stats


class StreamingHorizonMetrics:
    """Accumulates batch_metric_stats outputs; finalizes the evaluate_horizons dict."""

    def __init__(
        self,
        num_horizons: int,
        scaler: StandardScaler | None = None,
        flush_every: int = 128,
    ):
        self.stats = np.zeros((num_horizons, NUM_STATS), dtype=np.float64)
        scale, mean = scaler_affine(scaler)
        self.scale = jnp.asarray(scale, jnp.float32)
        self.mean = jnp.asarray(mean, jnp.float32)
        self.flush_every = flush_every
        self._pending: list[jnp.ndarray] = []

    def update(
        self,
        y_true_scaled: jnp.ndarray,
        y_pred_scaled: jnp.ndarray,
        valid: jnp.ndarray | None = None,
    ) -> None:
        if valid is None:
            valid = jnp.ones((y_true_scaled.shape[0],), bool)
        s = batch_metric_stats(y_true_scaled, y_pred_scaled, valid, self.scale, self.mean)
        # stay on device; read back in chunks so fp32 partial sums stay short and
        # the host sync cost amortizes (one readback per flush_every batches)
        self._pending.append(s)
        if len(self._pending) >= self.flush_every:
            self._flush()

    def _flush(self) -> None:
        if not self._pending:
            return
        chunk = jnp.sum(jnp.stack(self._pending), axis=0)
        self.stats += np.asarray(chunk, dtype=np.float64)
        self._pending = []

    def finalize(self) -> dict[str, Any]:
        self._flush()
        n = self.stats[:, 0]
        n = np.where(n == 0, 1.0, n)
        sum_abs, sum_sq = self.stats[:, 1], self.stats[:, 2]
        sy, syy = self.stats[:, 3], self.stats[:, 4]
        sp, spp = self.stats[:, 5], self.stats[:, 6]
        syp = self.stats[:, 7]

        mae = sum_abs / n
        rmse = np.sqrt(sum_sq / n)
        ss_tot = syy - sy**2 / n
        with np.errstate(divide="ignore", invalid="ignore"):
            r2 = 1.0 - sum_sq / ss_tot
        r2 = np.where(ss_tot <= 0, np.where(sum_sq == 0, 1.0, 0.0), r2)
        var_t = syy / n - (sy / n) ** 2
        var_p = spp / n - (sp / n) ** 2
        cov = syp / n - (sy / n) * (sp / n)
        with np.errstate(divide="ignore", invalid="ignore"):
            pearson = cov / np.sqrt(var_t * var_p)
        pearson = np.where((var_t <= 0) | (var_p <= 0), 0.0, pearson)

        return {
            "mae_avg": float(mae.mean()),
            "rmse_avg": float(rmse.mean()),
            "r2_score_avg": float(r2.mean()),
            "pearson_r_avg": float(pearson.mean()),
            "mae_by_horizon": mae.tolist(),
            "rmse_by_horizon": rmse.tolist(),
            "r2_by_horizon": r2.tolist(),
            "pearson_by_horizon": pearson.tolist(),
        }


@partial(jax.jit, static_argnames=("quantiles", "offsets_mode"))
def batch_quantile_stats(
    y_true_scaled: jnp.ndarray,  # (B, L_out, ...) scaled
    y_pred_q_scaled: jnp.ndarray,  # (B, L_out, ..., Q) scaled, one per level
    valid: jnp.ndarray,          # (B,) bool
    scale: jnp.ndarray,          # () target-scaler scale
    mean: jnp.ndarray,           # () target-scaler mean
    quantiles: tuple[float, ...],
    offsets: jnp.ndarray | None = None,  # (L_out, Q) conformal offsets
    offsets_mode: str = "additive",
) -> jnp.ndarray:
    """-> (L_out, 1 + 2Q) float32 per-horizon sufficient statistics for
    probabilistic forecasts: [n, pinball_sum per level, below_count per level]
    in physical units with the same guard/clip semantics as the point stats.
    `offsets` (not None) applies split-conformal calibration
    (evaluation/conformal.py) in the given mode — levels are shifted
    (additive: + TECU offsets; scale: median + offset * band width), re-sorted
    (no crossing), and re-clipped; None scores the raw forecasts exactly as
    given."""
    nq = len(quantiles)
    l_out = y_true_scaled.shape[1]
    yt = y_true_scaled.reshape(y_true_scaled.shape[0], l_out, -1).astype(jnp.float32)
    yp = y_pred_q_scaled.reshape(
        y_pred_q_scaled.shape[0], l_out, -1, nq
    ).astype(jnp.float32)

    yp = jnp.nan_to_num(yp, nan=0.0, posinf=0.0, neginf=0.0)
    yt = yt * scale + mean
    yp = yp * scale + mean
    yt = jnp.nan_to_num(yt, nan=0.0, posinf=100.0, neginf=0.0)
    yp = jnp.clip(jnp.nan_to_num(yp, nan=0.0, posinf=100.0, neginf=0.0),
                  TEC_MIN, TEC_MAX)
    if offsets is not None:
        off = offsets[None, :, None, :].astype(jnp.float32)
        if offsets_mode == "scale":
            from tec_mollm_tpu.evaluation.conformal import WIDTH_EPS

            mi = quantiles.index(0.5)
            med = yp[..., mi : mi + 1]
            w = jnp.maximum(yp[..., -1:] - yp[..., :1], WIDTH_EPS)
            yp = med + off * w
        else:
            yp = yp + off
        yp = jnp.clip(jnp.sort(yp, axis=-1), TEC_MIN, TEC_MAX)

    w = valid.astype(jnp.float32)[:, None, None]            # (B, 1, 1)
    q = jnp.asarray(quantiles, jnp.float32)                  # (Q,)
    err = yt[..., None] - yp                                 # (B, L, M, Q)
    pinball = jnp.maximum(q * err, (q - 1.0) * err) * w[..., None]
    below = (yt[..., None] <= yp).astype(jnp.float32) * w[..., None]
    n = jnp.sum(w) * yt.shape[-1]
    return jnp.concatenate(
        [
            jnp.full((l_out, 1), n),
            jnp.sum(pinball, axis=(0, 2)),                   # (L, Q)
            jnp.sum(below, axis=(0, 2)),                     # (L, Q)
        ],
        axis=-1,
    )


class StreamingQuantileMetrics:
    """Accumulates batch_quantile_stats; finalizes pinball / calibration /
    interval-coverage summaries for the probabilistic head
    (ModelConfig.quantiles). Same device-side streaming design as
    StreamingHorizonMetrics: no prediction tensor ever reaches the host."""

    def __init__(
        self,
        num_horizons: int,
        quantiles: tuple[float, ...],
        scaler: StandardScaler | None = None,
        flush_every: int = 128,
        offsets=None,
    ):
        """offsets: split-conformal calibration (evaluation/conformal.py) —
        a ConformalOffsets object (carries its mode), or a bare (L_out, Q)
        array treated as additive; metrics then score the CALIBRATED
        intervals. None scores the raw head output."""
        self.quantiles = tuple(quantiles)
        nq = len(self.quantiles)
        self.stats = np.zeros((num_horizons, 1 + 2 * nq), dtype=np.float64)
        scale, mean = scaler_affine(scaler)
        self.scale = jnp.asarray(scale, jnp.float32)
        self.mean = jnp.asarray(mean, jnp.float32)
        self.offsets_mode = getattr(offsets, "mode", "additive")
        if offsets is not None and hasattr(offsets, "offsets"):
            offsets = offsets.offsets
        self.offsets = (
            None if offsets is None else jnp.asarray(offsets, jnp.float32)
        )
        self.flush_every = flush_every
        self._pending: list[jnp.ndarray] = []

    def update(
        self,
        y_true_scaled: jnp.ndarray,
        y_pred_q_scaled: jnp.ndarray,
        valid: jnp.ndarray | None = None,
        offsets_override: jnp.ndarray | None = None,
    ) -> None:
        """offsets_override: per-batch (L_out, Q) additive offsets replacing
        the constructor's (adaptive conformal streams evolving offsets — same
        jitted program, the offsets are a traced argument)."""
        if valid is None:
            valid = jnp.ones((y_true_scaled.shape[0],), bool)
        if offsets_override is not None:
            offsets = jnp.asarray(offsets_override, jnp.float32)
            mode = "additive"
        else:
            offsets, mode = self.offsets, self.offsets_mode
        s = batch_quantile_stats(
            y_true_scaled, y_pred_q_scaled, valid, self.scale, self.mean,
            self.quantiles, offsets, mode,
        )
        self._pending.append(s)
        if len(self._pending) >= self.flush_every:
            self._flush()
        return s  # (L_out, 1+2Q) device stats — adaptive conformal reads the
        # per-batch below-rates back for its coverage-feedback loop

    def _flush(self) -> None:
        if not self._pending:
            return
        chunk = jnp.sum(jnp.stack(self._pending), axis=0)
        self.stats += np.asarray(chunk, dtype=np.float64)
        self._pending = []

    def finalize(self) -> dict[str, Any]:
        self._flush()
        nq = len(self.quantiles)
        n = self.stats[:, 0]
        n = np.where(n == 0, 1.0, n)
        pinball = self.stats[:, 1 : 1 + nq] / n[:, None]      # (L, Q)
        below = self.stats[:, 1 + nq :] / n[:, None]          # (L, Q)
        out: dict[str, Any] = {
            "quantiles": list(self.quantiles),
            "pinball_avg": float(pinball.mean()),
            "pinball_by_level": pinball.mean(axis=0).tolist(),
            "pinball_by_horizon": pinball.mean(axis=1).tolist(),
            "pinball_by_horizon_level": pinball.tolist(),  # (L, Q)
            # calibration: fraction of truths at or below each level's forecast
            # (perfectly calibrated -> equals the nominal level)
            "calibration_by_level": below.mean(axis=0).tolist(),
        }
        if nq >= 2:
            lo, hi = self.quantiles[0], self.quantiles[-1]
            cover = below[:, -1] - below[:, 0]                # P(p_lo < y <= p_hi)
            out["interval_nominal"] = hi - lo
            out["interval_coverage"] = float(cover.mean())
            out["interval_coverage_by_horizon"] = cover.tolist()
        return out
