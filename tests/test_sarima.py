"""First-party batched SARIMA baseline (models/sarima.py): fit correctness on
data generated from the model's own recursion, forecast quality, guards, and
the eval-harness wiring (VERDICT r2 missing #4)."""

import numpy as np
import pytest

from tec_mollm_tpu.models.sarima import fit_sarima, forecast_windows


def _simulate_sarima(
    T: int, N: int, season: int, phi: float, sphi: float,
    theta: float, stheta: float, seed: int = 1,
) -> np.ndarray:
    """Draw from SARIMA(1,1,1)x(1,1,1,season): SARMA innovations recursion,
    then integrate (1-B) and (1-B^s)."""
    rng = np.random.default_rng(seed)
    eps = rng.normal(0, 1, (T, N))
    y = np.zeros((T, N))
    for t in range(T):
        y[t] = eps[t]
        if t >= 1:
            y[t] += phi * y[t - 1] + theta * eps[t - 1]
        if t >= season:
            y[t] += sphi * y[t - season] + stheta * eps[t - season]
        if t >= season + 1:
            y[t] += (
                -phi * sphi * y[t - season - 1]
                + theta * stheta * eps[t - season - 1]
            )
    x1 = np.cumsum(y, axis=0)
    x = np.zeros_like(x1)
    for t in range(T):
        x[t] = x1[t] + (x[t - season] if t >= season else 0.0)
    return x


class TestSarimaFitForecast:
    def test_forecasts_true_sarima_process(self):
        """On data drawn from the model class, the fitted forecaster must beat
        seasonal-naive by a wide margin (the optimal predictor exploits the
        ARMA structure; naive only the seasonality)."""
        s = 12
        x = _simulate_sarima(1200, 4, s, 0.5, 0.3, -0.4, -0.2)
        params = fit_sarima(x[:1000], season=s, steps=300)
        wins = np.stack([x[1000 - 96 + k : 1000 + k] for k in range(8)])
        truth = np.stack([x[1000 + k : 1012 + k] for k in range(8)])
        preds = forecast_windows(params, wins, L_out=12, season=s)
        assert preds.shape == (8, 12, 4)
        mae = np.abs(preds - truth).mean()
        mae_naive = np.abs(wins[:, -12:, :] - truth).mean()
        assert mae < 0.5 * mae_naive

    def test_recovers_ar_coefficient(self):
        """AR(1)-dominated process (no MA): phi should be recovered to ~0.15."""
        s = 12
        x = _simulate_sarima(1500, 6, s, 0.6, 0.0, 0.0, 0.0, seed=2)
        params = fit_sarima(x[:1400], season=s, steps=400)
        assert params.phi.mean() == pytest.approx(0.6, abs=0.15)

    def test_per_node_independence(self):
        """Batched fitting must not couple nodes: a node with strong AR and a
        node with none get clearly different phi."""
        s = 6
        rng = np.random.default_rng(3)
        strong = _simulate_sarima(900, 1, s, 0.7, 0.0, 0.0, 0.0, seed=4)
        white = np.cumsum(rng.normal(0, 1, (900, 1)), axis=0)
        white_s = np.zeros_like(white)
        for t in range(900):
            white_s[t] = white[t] + (white_s[t - s] if t >= s else 0.0)
        x = np.concatenate([strong, white_s], axis=1)
        params = fit_sarima(x, season=s, steps=400)
        assert params.phi[0] > params.phi[1] + 0.25

    def test_short_series_and_window_guards(self):
        with pytest.raises(ValueError, match="too short"):
            fit_sarima(np.zeros((20, 2)), season=12)
        params = fit_sarima(_simulate_sarima(300, 2, 4, 0.3, 0.1, 0.0, 0.0), season=4)
        with pytest.raises(ValueError, match="L_in"):
            forecast_windows(params, np.zeros((2, 8, 2)), L_out=4, season=4)

    def test_seasonal_random_walk_cancels_arma_factors(self):
        """Pure (1-B)(1-B^s) integration of white noise: y = eps is ALSO
        representable with any phi = -theta (common-factor cancellation), so
        individual coefficients are unidentifiable — what must hold is that
        the AR and MA factors cancel: phi+theta ~ 0 and Phi+Theta ~ 0."""
        s = 6
        x = _simulate_sarima(800, 3, s, 0.0, 0.0, 0.0, 0.0, seed=5)
        params = fit_sarima(x[:700], season=s, steps=300)
        assert np.abs(params.phi + params.theta).max() < 0.15
        assert np.abs(params.sphi + params.stheta).max() < 0.15


class TestSarimaHarness:
    def test_evaluate_sarima_streaming(self, rng):
        """Harness wiring on a tiny split: shapes, scaler plumbing, and finite
        physical-unit metrics."""
        from tec_mollm_tpu.data.dataset import SlidingWindowDataset
        from tec_mollm_tpu.data.scaler import StandardScaler
        from tec_mollm_tpu.evaluation.harness import evaluate_sarima_streaming

        s = 4
        T, N, L_in, L_out = 120, 6, 16, 4
        x_phys = 40 + 8 * np.sin(2 * np.pi * np.arange(T) / s)[:, None] + \
            rng.normal(0, 1, (T, N)).cumsum(axis=0) * 0.1
        fscaler = StandardScaler()
        fscaler.mean_ = np.array([40.0])
        fscaler.scale_ = np.array([8.0])
        tscaler = StandardScaler()
        tscaler.mean_ = np.array([40.0])
        tscaler.scale_ = np.array([7.0])

        x_fs = (x_phys - 40.0) / 8.0
        # Y[t] holds the L_out future TEC steps in TARGET-scaled units
        # (only defined where a full horizon exists; the dataset never samples
        # the undefined tail)
        y_ts = np.zeros((T, N, L_out), np.float32)
        for t in range(T - L_out):
            y_ts[t] = ((x_phys[t + 1 : t + 1 + L_out] - 40.0) / 7.0).T
        ds = SlidingWindowDataset(
            {
                "X": x_fs[..., None].astype(np.float32),
                "Y": y_ts.astype(np.float32),
                "time_features": np.zeros((T, 4), np.int32),
            },
            L_in=L_in, L_out=L_out, stride=1,
        )
        metrics = evaluate_sarima_streaming(
            ds, x_fs[:100], L_out, fscaler, tscaler,
            season=s, fit_steps=100, fit_window=100,
        )
        assert np.isfinite(metrics["mae_avg"])
        assert len(metrics["mae_by_horizon"]) == L_out
        # the series is dominated by its seasonal cycle: physical-unit MAE must
        # be far below the 8-TECU seasonal amplitude
        assert metrics["mae_avg"] < 4.0
