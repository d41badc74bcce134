"""Split-conformal calibration of the quantile head's intervals.

Round-3 measurement (BASELINE.md r3k): the pinball-trained quantile head is
badly underdispersed — 0.617 observed coverage for the nominal 80% band, and
the 0.5 level sits at 0.287. Nothing in the reference corrects this (it has no
probabilistic head at all); the standard cheap fix is split conformal
prediction: fit per-(horizon, level) additive offsets on held-out validation
residuals so each level is marginally calibrated, then apply them at
eval/predict/serve time.

Method (per-level split conformal, the marginal variant of CQR —
Romano, Patterson & Candes 2019):
    For level q and horizon h, the adjusted forecast is
        pred'_qh(x) = sort_q(pred_qh(x) + delta[h, q])
    with delta[h, q] = the q-th empirical quantile (with the (n+1)/n
    finite-sample correction) of the calibration residuals y - pred_qh(x).
    Then P(y <= pred'_qh) ~= q on exchangeable data, so every level is
    calibrated and the (lo, hi) interval covers ~= hi - lo. The sort keeps
    levels non-crossing after adjustment (the head sorts raw levels the same
    way, models/head.py).

Residual quantiles are computed from STREAMING on-device histograms — the
archive-scale calibration set (8.7k windows x 2911 nodes x 12 horizons x Q
levels ~= 10^9 residuals) never materializes anywhere: each batch scatter-adds
into a (L_out * Q * BINS) histogram in HBM (0.1-TECU resolution over the
physical [-200, 200] residual range), and the host inverts the CDF once at
finalize. Residuals use the exact metric-suite semantics (guard scaled preds,
inverse-transform, nan guards, physical clip — evaluation/metrics.py:41-52).
"""

from __future__ import annotations

import logging
import os
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from tec_mollm_tpu.data.scaler import StandardScaler
from tec_mollm_tpu.evaluation.metrics import TEC_MAX, TEC_MIN
from tec_mollm_tpu.evaluation.streaming import scaler_affine

logger = logging.getLogger(__name__)

# residual range: truths lie in the guard range [0, ~200], preds are clipped to
# [0, 200], so residuals y - p lie in [-200, 200]; 4000 bins = 0.1 TECU each
RESID_LO = -200.0
RESID_HI = 200.0
BINS = 4000

# scale mode: normalized residual t = (y - p_median) / max(band_width, eps);
# |t| > 20 band-widths is effectively impossible — 4000 bins = 0.01 each
T_LO = -20.0
T_HI = 20.0
WIDTH_EPS = 0.5  # TECU floor on the band width (avoids divide-by-~0 windows)


@partial(jax.jit, static_argnames=("nq", "bins"))
def batch_residual_hist(
    y_true_scaled: jnp.ndarray,    # (B, L_out, ...) scaled
    y_pred_q_scaled: jnp.ndarray,  # (B, L_out, ..., Q) scaled
    valid: jnp.ndarray,            # (B,) bool
    scale: jnp.ndarray,
    mean: jnp.ndarray,
    nq: int,
    bins: int = BINS,
) -> jnp.ndarray:
    """-> (L_out, nq, bins) float32 histogram of physical residuals y - p."""
    l_out = y_true_scaled.shape[1]
    yt = y_true_scaled.reshape(y_true_scaled.shape[0], l_out, -1).astype(jnp.float32)
    yp = y_pred_q_scaled.reshape(
        y_pred_q_scaled.shape[0], l_out, -1, nq
    ).astype(jnp.float32)

    # identical guard/clip semantics to the metric suite (streaming.py)
    yp = jnp.nan_to_num(yp, nan=0.0, posinf=0.0, neginf=0.0)
    yt = yt * scale + mean
    yp = yp * scale + mean
    yt = jnp.nan_to_num(yt, nan=0.0, posinf=100.0, neginf=0.0)
    yp = jnp.clip(jnp.nan_to_num(yp, nan=0.0, posinf=100.0, neginf=0.0),
                  TEC_MIN, TEC_MAX)

    resid = yt[..., None] - yp                                  # (B, L, M, Q)
    width = (RESID_HI - RESID_LO) / bins
    idx = jnp.clip(
        jnp.floor((resid - RESID_LO) / width).astype(jnp.int32), 0, bins - 1
    )
    l_ids = jnp.arange(l_out, dtype=jnp.int32)[None, :, None, None]
    q_ids = jnp.arange(nq, dtype=jnp.int32)[None, None, None, :]
    seg = (l_ids * nq + q_ids) * bins + idx                     # (B, L, M, Q)
    w = jnp.broadcast_to(
        valid.astype(jnp.float32)[:, None, None, None], seg.shape
    )
    hist = jax.ops.segment_sum(
        w.reshape(-1), seg.reshape(-1), num_segments=l_out * nq * bins
    )
    return hist.reshape(l_out, nq, bins)


@partial(jax.jit, static_argnames=("nq", "median_index", "bins"))
def batch_scaled_residual_hist(
    y_true_scaled: jnp.ndarray,
    y_pred_q_scaled: jnp.ndarray,
    valid: jnp.ndarray,
    scale: jnp.ndarray,
    mean: jnp.ndarray,
    nq: int,
    median_index: int,
    bins: int = BINS,
) -> jnp.ndarray:
    """-> (L_out, bins) histogram of NORMALIZED residuals
    t = (y - p_median) / max(p_hi - p_lo, WIDTH_EPS) — the scale-conformal
    nonconformity score. One histogram serves every level (the q-th quantile
    of t is read off the same CDF)."""
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

    med = yp[..., median_index]
    w = jnp.maximum(yp[..., -1] - yp[..., 0], WIDTH_EPS)
    t = (yt - med) / w                                          # (B, L, M)
    bw = (T_HI - T_LO) / bins
    idx = jnp.clip(jnp.floor((t - T_LO) / bw).astype(jnp.int32), 0, bins - 1)
    l_ids = jnp.arange(l_out, dtype=jnp.int32)[None, :, None]
    seg = l_ids * bins + idx
    wv = jnp.broadcast_to(valid.astype(jnp.float32)[:, None, None], seg.shape)
    hist = jax.ops.segment_sum(
        wv.reshape(-1), seg.reshape(-1), num_segments=l_out * bins
    )
    return hist.reshape(l_out, bins)


def _hist_quantile(counts: np.ndarray, q: float, edges: np.ndarray) -> float:
    """Finite-sample conformal quantile from one histogram: target the
    ceil(q*(n+1)) order statistic with LINEAR interpolation inside the bin
    (a hard upper edge overshoots coverage by up to one bin's probability
    mass — measurable when the spread is only a few bins wide)."""
    n = counts.sum()
    if n <= 0:
        return 0.0
    width = edges[1] - edges[0]
    target = min(np.ceil(q * (n + 1)), n)
    cdf = np.cumsum(counts)
    k = int(np.searchsorted(cdf, target - 1e-9))
    prev = cdf[k - 1] if k > 0 else 0.0
    frac = (target - prev) / max(counts[k], 1.0)
    return float(edges[k] + width * min(frac, 1.0))


class ConformalCalibrator:
    """Streams (truth, quantile-forecast) batches into residual histograms and
    finalizes per-(horizon, level) conformal offsets.

    mode='additive': delta[h, q] in physical TECU, applied as pred_q + delta.
    mode='scale': delta[h, q] in band-width units, applied as
    pred_med + delta * max(pred_hi - pred_lo, eps). Under residual-SCALE
    drift (the solar-cycle arena: activity — and with it both the model's
    predicted band width and the true error scale — grows from the val period
    into the test period), additive offsets fit on val under-cover the test;
    the normalized score transfers as long as residual/width stays stationary,
    which RevIN encourages (width is produced through the same per-window
    sigma as the forecast)."""

    def __init__(
        self,
        num_horizons: int,
        quantiles: tuple[float, ...],
        scaler: StandardScaler | None = None,
        flush_every: int = 64,
        mode: str = "additive",
    ):
        if mode not in ("additive", "scale"):
            raise ValueError(f"unknown conformal mode {mode!r}")
        self.mode = mode
        self.quantiles = tuple(quantiles)
        self.num_horizons = num_horizons
        scale, mean = scaler_affine(scaler)
        self.scale = jnp.asarray(scale, jnp.float32)
        self.mean = jnp.asarray(mean, jnp.float32)
        shape = (
            (num_horizons, len(self.quantiles), BINS)
            if mode == "additive"
            else (num_horizons, BINS)
        )
        self.hist = np.zeros(shape, dtype=np.float64)
        self.flush_every = flush_every
        self._pending: list[jnp.ndarray] = []

    def update(self, y_true_scaled, y_pred_q_scaled, valid=None) -> None:
        if valid is None:
            valid = jnp.ones((y_true_scaled.shape[0],), bool)
        if self.mode == "additive":
            h = batch_residual_hist(
                y_true_scaled, y_pred_q_scaled, valid, self.scale, self.mean,
                len(self.quantiles),
            )
        else:
            h = batch_scaled_residual_hist(
                y_true_scaled, y_pred_q_scaled, valid, self.scale, self.mean,
                len(self.quantiles), self.quantiles.index(0.5),
            )
        self._pending.append(h)
        if len(self._pending) >= self.flush_every:
            self._flush()

    def _flush(self) -> None:
        if not self._pending:
            return
        chunk = jnp.sum(jnp.stack(self._pending), axis=0)
        self.hist += np.asarray(chunk, dtype=np.float64)
        self._pending = []

    def finalize(self) -> "ConformalOffsets":
        self._flush()
        nq = len(self.quantiles)
        offsets = np.zeros((self.num_horizons, nq), dtype=np.float64)
        if self.mode == "additive":
            edges = np.linspace(RESID_LO, RESID_HI, BINS + 1)
            n_total = float(self.hist[0].sum(axis=-1).max()) if nq else 0.0
            for h in range(self.num_horizons):
                for j, q in enumerate(self.quantiles):
                    offsets[h, j] = _hist_quantile(self.hist[h, j], q, edges)
        else:
            edges = np.linspace(T_LO, T_HI, BINS + 1)
            n_total = float(self.hist[0].sum())
            for h in range(self.num_horizons):
                for j, q in enumerate(self.quantiles):
                    offsets[h, j] = _hist_quantile(self.hist[h], q, edges)
        return ConformalOffsets(
            quantiles=self.quantiles, offsets=offsets, n_calibration=n_total,
            mode=self.mode,
        )


class ConformalOffsets:
    """Per-(horizon, level) conformal offsets + persistence.

    mode='additive': offsets in physical TECU, pred'_q = pred_q + delta.
    mode='scale': offsets in band-width units,
    pred'_q = pred_med + delta * max(pred_hi - pred_lo, WIDTH_EPS)."""

    def __init__(
        self,
        quantiles: tuple[float, ...],
        offsets: np.ndarray,              # (L_out, Q)
        n_calibration: float = 0.0,
        mode: str = "additive",
    ):
        if mode not in ("additive", "scale"):
            raise ValueError(f"unknown conformal mode {mode!r}")
        self.quantiles = tuple(float(q) for q in quantiles)
        self.offsets = np.asarray(offsets, dtype=np.float64)
        self.n_calibration = float(n_calibration)
        self.mode = mode
        if self.offsets.ndim != 2 or self.offsets.shape[1] != len(self.quantiles):
            raise ValueError(
                f"offsets shape {self.offsets.shape} does not match "
                f"{len(self.quantiles)} quantile levels"
            )

    @property
    def median_index(self) -> int:
        return self.quantiles.index(0.5)

    def apply_physical(self, yp_phys: np.ndarray) -> np.ndarray:
        """Adjust PHYSICAL-unit quantile forecasts (..., L_out, N, Q) per the
        mode, re-sort levels (no crossing), re-clip."""
        if self.mode == "scale":
            med = yp_phys[..., self.median_index : self.median_index + 1]
            w = np.maximum(yp_phys[..., -1:] - yp_phys[..., :1], WIDTH_EPS)
            adj = med + self.offsets[:, None, :] * w
        else:
            adj = yp_phys + self.offsets[:, None, :]
        return np.clip(np.sort(adj, axis=-1), TEC_MIN, TEC_MAX)

    def save(self, path: str) -> None:
        np.savez(
            path,
            quantiles=np.asarray(self.quantiles, dtype=np.float64),
            offsets=self.offsets,
            n_calibration=np.asarray(self.n_calibration),
            mode=np.asarray(self.mode),
        )

    @classmethod
    def load(cls, path: str) -> "ConformalOffsets":
        with np.load(path) as d:
            return cls(
                quantiles=tuple(d["quantiles"].tolist()),
                offsets=d["offsets"],
                n_calibration=float(d["n_calibration"]),
                mode=str(d["mode"]) if "mode" in d else "additive",
            )

    @classmethod
    def path_for(cls, checkpoint_path: str) -> str:
        """Canonical artifact location: next to the checkpoint, like config.json."""
        return os.path.join(os.path.dirname(checkpoint_path), "conformal.npz")


def fit_conformal(
    cfg,
    params: Any,
    dataset,
    graph,
    target_scaler: StandardScaler | None,
    batch_size: int = 16,
    mode: str = "additive",
) -> ConformalOffsets:
    """Run inference over a calibration split (normally val) and fit offsets.

    Streaming end to end: inference is data-parallel over the mesh (the
    EvalExecutor used by every eval entry point), residual histograms reduce on
    device, only (L_out, Q, BINS) counts cross to the host per flush."""
    from tec_mollm_tpu.data.device_data import DeviceResidentDataset
    from tec_mollm_tpu.evaluation.harness import EvalExecutor

    quantiles = cfg.model.quantiles
    if not quantiles:
        raise ValueError("conformal calibration needs a quantile-head model "
                         "(ModelConfig.quantiles)")
    device_ds = dataset if isinstance(dataset, DeviceResidentDataset) else None
    ex = EvalExecutor(
        cfg, graph, params, batch_size, device_dataset=device_ds
    )
    cal = ConformalCalibrator(cfg.train.L_out, quantiles, target_scaler, mode=mode)
    for batch in ex.loader(dataset):
        _, preds, trues, valid_dev = ex.run(batch)
        cal.update(trues, preds, valid_dev)
    off = cal.finalize()
    logger.info(
        "conformal offsets (%s) fit on %d windows: per-level range %s",
        mode, len(dataset),
        {f"{q:g}": (round(float(off.offsets[:, j].min()), 2),
                    round(float(off.offsets[:, j].max()), 2))
         for j, q in enumerate(off.quantiles)},
    )
    return off


def offsets_from_histograms(
    hist: np.ndarray, quantiles: tuple[float, ...]
) -> np.ndarray:
    """(L, Q, BINS) additive residual histograms -> (L, Q) offsets (the same
    finite-sample interpolated inversion the static calibrator uses)."""
    l_out, nq = hist.shape[0], hist.shape[1]
    edges = np.linspace(RESID_LO, RESID_HI, BINS + 1)
    out = np.zeros((l_out, nq))
    for h in range(l_out):
        for j, q in enumerate(quantiles):
            out[h, j] = _hist_quantile(hist[h, j], q, edges)
    return out


def evaluate_adaptive_conformal(
    cfg,
    params: Any,
    dataset,
    graph,
    target_scaler: StandardScaler | None,
    batch_size: int = 16,
    warm_offsets: "ConformalOffsets | None" = None,
    decay: float = 0.99,
    level_gain: float = 0.05,
    min_residual_mass: float = 10_000.0,
) -> dict[str, Any]:
    """Adaptive conformal on the chronological test stream (rolling
    recalibration; the streaming form of Gibbs & Candes-style adaptive
    conformal inference).

    Every static split-conformal variant failed the solar-cycle arena
    (BASELINE.md round 4: raw 0.508; additive/scale x full/tail val all in
    0.45-0.54 for the 0.800 band) because residual scale keeps GROWING from
    any calibration period into the deployment period. Operationally the fix
    is the one a deployed forecaster actually has: recalibrate on its own
    recent errors. Here the offsets applied to window k come from an
    exponentially-decayed histogram of residuals of windows j <= k - L_out —
    i.e. forecasts whose ENTIRE target range was observed before window k's
    forecast was issued (no leakage; the maturity lag is enforced by holding
    the newest ceil(L_out/B)+1 batch histograms out of the aggregate).

    `level_gain` adds the ACI error-feedback term (Gibbs & Candes 2021):
    the histogram is inverted at EFFECTIVE levels q_eff that integrate the
    realized coverage error, q_eff += gain * (q - observed_below_rate), so
    systematic lag under MONOTONE drift (the rolling histogram always trails
    a still-growing residual scale; measured 0.758 for the 0.800 band with
    pure rolling recalibration on the solar-cycle arena) is steered out.
    0 disables the feedback.

    Multi-process safe (round 5, VERDICT r4 weak #3): BatchLoader's strided
    shard (order[rank::world]) makes every GLOBAL batch a contiguous
    chronological block of windows — exactly the block a single process would
    put in batch b — so the batch-granular adaptation (offsets, maturity lag,
    ACI feedback all operate per batch, never per row) is process-count
    invariant. The two per-batch readbacks (metric summary, residual
    histogram) are forced replicated so every host evolves identical
    calibrator state.

    Returns the quantile-metrics dict measured with the evolving offsets,
    plus adaptation metadata."""
    import jax

    from tec_mollm_tpu.data.device_data import DeviceResidentDataset
    from tec_mollm_tpu.evaluation.harness import EvalExecutor
    from tec_mollm_tpu.evaluation.streaming import StreamingQuantileMetrics
    quantiles = cfg.model.quantiles
    if not quantiles:
        raise ValueError("adaptive conformal needs a quantile-head model")
    nq = len(quantiles)
    l_out = cfg.train.L_out
    device_ds = dataset if isinstance(dataset, DeviceResidentDataset) else None
    ex = EvalExecutor(cfg, graph, params, batch_size, device_dataset=device_ds)

    acc = StreamingQuantileMetrics(l_out, quantiles, target_scaler)
    cal = ConformalCalibrator(l_out, quantiles, target_scaler)  # reuse hists
    H = np.zeros((l_out, nq, BINS), dtype=np.float64)
    pending: list[np.ndarray] = []
    lag_batches = -(-l_out // max(ex.batch_size, 1)) + 1
    min_resid = min_residual_mass  # fall back to warm offsets below this mass
    warm = None if warm_offsets is None else warm_offsets.offsets
    used_adaptive = 0
    n_batches = 0
    q_eff = np.asarray(quantiles, dtype=np.float64)  # ACI effective levels

    rep_jit = (
        jax.jit(lambda t: t, out_shardings=ex.rep)
        if jax.process_count() > 1
        else None
    )

    def host(a):
        """Per-batch readback of a small reduction; forced replicated under
        multi-process so every host sees the same value."""
        if rep_jit is not None:
            return np.asarray(jax.device_get(rep_jit(a)), dtype=np.float64)
        return np.asarray(a, dtype=np.float64)

    for batch in ex.loader(dataset, prefetch=0):
        _, preds, trues, valid_dev = ex.run(batch)
        n_mass = float(H[0].sum(axis=-1).max()) if H.size else 0.0
        if n_mass >= min_resid:
            offs = offsets_from_histograms(H, tuple(q_eff))
            used_adaptive += 1
        elif warm is not None:
            offs = warm
        else:
            offs = np.zeros((l_out, nq))
        s = acc.update(trues, preds, valid_dev, offsets_override=offs)
        if level_gain > 0.0:
            # realized below-rate of the ADJUSTED forecasts this batch ->
            # integrate the coverage error into the effective levels
            s_host = host(s)  # (L, 1+2Q)
            n_b = max(float(s_host[:, 0].max()), 1.0)
            below_rate = s_host[:, 1 + nq :].sum(axis=0) / (n_b * l_out)  # (Q,)
            q_eff = np.clip(
                q_eff + level_gain * (np.asarray(quantiles) - below_rate),
                0.005, 0.995,
            )
        # histogram THIS batch's residuals; fold into the aggregate only after
        # the maturity lag, with exponential decay for recency
        hb = host(
            batch_residual_hist(trues, preds, valid_dev, cal.scale, cal.mean, nq)
        )
        pending.append(hb)
        if len(pending) > lag_batches:
            H = decay * H + pending.pop(0)
        n_batches += 1

    result = acc.finalize()
    result["adaptive"] = {
        "decay": decay,
        "lag_batches": lag_batches,
        "batches": n_batches,
        "batches_on_adaptive_offsets": used_adaptive,
        "warm_start": warm_offsets is not None,
        "level_gain": level_gain,
        "final_effective_levels": [round(float(v), 4) for v in q_eff],
    }
    return result
