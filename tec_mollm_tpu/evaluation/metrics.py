"""Per-horizon evaluation metrics, first-party (no sklearn/scipy at runtime).

Behavioral contract (reference /root/reference/src/evaluation/metrics.py) — every
detail below affects the reported numbers and is replicated exactly (SURVEY.md §7
"Metric parity details"):
  * predictions (scaled) are nan_to_num-guarded to 0 before anything else
    (metrics.py:137-144);
  * per horizon h: inverse-transform y_true/y_pred via the target scaler
    (metrics.py:37-38); non-finite values after inverse transform clamp with
    nan->0, +inf->100, -inf->0 (metrics.py:41-47);
  * predictions clipped to physical [0, 200] TECU (metrics.py:51-52) — true values
    are NOT clipped;
  * arrays reshaped to 2D (samples, outputs); MAE and RMSE are overall means;
    R^2 is per-output then uniform-averaged (sklearn r2_score default);
    Pearson r on the flattened arrays with a std>0 guard returning 0.0
    (metrics.py:59-79);
  * evaluate_horizons returns {metric}_avg plus {metric}_by_horizon lists
    (metrics.py:170-180).
"""

from __future__ import annotations

import logging

import numpy as np

from tec_mollm_tpu.data.scaler import StandardScaler

logger = logging.getLogger(__name__)

TEC_MIN, TEC_MAX = 0.0, 200.0


def _mae(y_true: np.ndarray, y_pred: np.ndarray) -> float:
    return float(np.mean(np.abs(y_true - y_pred)))


def _rmse(y_true: np.ndarray, y_pred: np.ndarray) -> float:
    return float(np.sqrt(np.mean((y_true - y_pred) ** 2)))


def _r2(y_true: np.ndarray, y_pred: np.ndarray) -> float:
    """sklearn r2_score semantics: per-column R^2, uniform average; zero-variance
    columns score 1.0 if perfectly predicted else 0.0."""
    ss_res = ((y_true - y_pred) ** 2).sum(axis=0)
    ss_tot = ((y_true - y_true.mean(axis=0)) ** 2).sum(axis=0)
    with np.errstate(divide="ignore", invalid="ignore"):
        r2 = 1.0 - ss_res / ss_tot
    degenerate = ss_tot == 0
    r2 = np.where(degenerate, np.where(ss_res == 0, 1.0, 0.0), r2)
    return float(np.mean(r2))


def _pearson(y_true_flat: np.ndarray, y_pred_flat: np.ndarray) -> float:
    if np.std(y_true_flat) > 0 and np.std(y_pred_flat) > 0:
        yt = y_true_flat - y_true_flat.mean()
        yp = y_pred_flat - y_pred_flat.mean()
        return float((yt @ yp) / np.sqrt((yt @ yt) * (yp @ yp)))
    return 0.0


def evaluate_metrics_unscaled_fallback(
    y_true_unscaled: np.ndarray, y_pred_unscaled: np.ndarray
) -> dict[str, float]:
    """Metrics on already-physical (unscaled) data with the reference's exact
    fallback semantics (metrics.py:91-117): arrays reshaped to 2D on the last
    axis; MAE/RMSE over all elements; R^2 = per-column uniform average
    (sklearn default multioutput); Pearson = mean of PER-COLUMN correlations
    with the std>0 guard — unlike the wired scaled path, which flattens
    before Pearson (evaluate_metrics below)."""
    yt = np.asarray(y_true_unscaled, dtype=np.float64)
    yp = np.asarray(y_pred_unscaled, dtype=np.float64)
    if yt.ndim > 2:
        yt = yt.reshape(-1, yt.shape[-1])
        yp = yp.reshape(-1, yp.shape[-1])
    elif yt.ndim == 1:
        yt = yt[:, None]
        yp = yp[:, None]
    pearsons = [
        _pearson(yt[:, i], yp[:, i]) for i in range(yt.shape[1])
    ]
    return {
        "mae": _mae(yt, yp),
        "rmse": _rmse(yt, yp),
        "r2_score": _r2(yt, yp),
        "pearson_r": float(np.mean(pearsons)),
    }


def evaluate_metrics(
    y_true_scaled: np.ndarray,
    y_pred_scaled: np.ndarray,
    scaler: StandardScaler | None,
) -> dict[str, float]:
    """Metrics for one horizon slice. Inputs are in scaled (standardized) units;
    `scaler=None` means the data is already in physical units and keeps the
    flattened-Pearson semantics of the wired path; for the reference's
    per-column-Pearson fallback contract use evaluate_metrics_unscaled_fallback."""
    y_true = np.asarray(y_true_scaled, dtype=np.float64)
    y_pred = np.asarray(y_pred_scaled, dtype=np.float64)

    if scaler is not None:
        shape_t, shape_p = y_true.shape, y_pred.shape
        y_true = scaler.inverse_transform(y_true.reshape(-1, 1)).reshape(shape_t)
        y_pred = scaler.inverse_transform(y_pred.reshape(-1, 1)).reshape(shape_p)

    if not np.all(np.isfinite(y_true)):
        y_true = np.nan_to_num(y_true, nan=0.0, posinf=100.0, neginf=0.0)
    if not np.all(np.isfinite(y_pred)):
        y_pred = np.nan_to_num(y_pred, nan=0.0, posinf=100.0, neginf=0.0)

    y_pred = np.clip(y_pred, TEC_MIN, TEC_MAX)

    if y_true.ndim > 2:
        y_true = y_true.reshape(-1, y_true.shape[-1])
        y_pred = y_pred.reshape(-1, y_pred.shape[-1])
    elif y_true.ndim == 1:
        y_true = y_true[:, None]
        y_pred = y_pred[:, None]

    return {
        "mae": _mae(y_true, y_pred),
        "rmse": _rmse(y_true, y_pred),
        "r2_score": _r2(y_true, y_pred),
        "pearson_r": _pearson(y_true.ravel(), y_pred.ravel()),
    }


def evaluate_horizons(
    y_true_horizons_scaled: np.ndarray,
    y_pred_horizons_scaled: np.ndarray,
    target_scaler: StandardScaler | str | None = None,
) -> dict[str, object]:
    """Metrics per horizon + averages. Inputs (B, L_out, ...) in scaled units.

    `target_scaler` may be a StandardScaler, a path to a saved scaler .npz, or None
    (already-unscaled data)."""
    y_true = np.asarray(y_true_horizons_scaled)
    y_pred = np.asarray(y_pred_horizons_scaled)

    if not np.all(np.isfinite(y_pred)):
        bad = int(np.sum(~np.isfinite(y_pred)))
        logger.warning("Overflow guard: %d non-finite predictions clamped to 0", bad)
        y_pred = np.nan_to_num(y_pred, nan=0.0, posinf=0.0, neginf=0.0)

    scaler: StandardScaler | None
    if isinstance(target_scaler, str):
        scaler = StandardScaler.load(target_scaler)
    else:
        scaler = target_scaler

    num_horizons = y_true.shape[1]
    per_h = [
        evaluate_metrics(y_true[:, h], y_pred[:, h], scaler) for h in range(num_horizons)
    ]
    return {
        "mae_avg": float(np.mean([m["mae"] for m in per_h])),
        "rmse_avg": float(np.mean([m["rmse"] for m in per_h])),
        "r2_score_avg": float(np.mean([m["r2_score"] for m in per_h])),
        "pearson_r_avg": float(np.mean([m["pearson_r"] for m in per_h])),
        "mae_by_horizon": [m["mae"] for m in per_h],
        "rmse_by_horizon": [m["rmse"] for m in per_h],
        "r2_by_horizon": [m["r2_score"] for m in per_h],
        "pearson_by_horizon": [m["pearson_r"] for m in per_h],
    }
