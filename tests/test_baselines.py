"""Baseline forecaster tests (reference test.py:46-71 window-mean HA and
baselines.py:9-45 climatology semantics)."""

import numpy as np
import pytest

from tec_mollm_tpu.data.dataset import SlidingWindowDataset
from tec_mollm_tpu.models.baselines import (
    HistoricalAverage,
    SeasonalNaive,
    WindowMeanBaseline,
    sarima_baseline,
)


class TestWindowMean:
    def test_prediction_is_window_mean_repeated(self, rng):
        x_tec = rng.normal(size=(3, 16, 10)).astype(np.float32)
        preds = WindowMeanBaseline().predict_batch(x_tec, L_out=4)
        assert preds.shape == (3, 4, 10, 1)
        expect = x_tec.mean(axis=1)
        for h in range(4):
            np.testing.assert_allclose(preds[:, h, :, 0], expect, rtol=1e-6)

    def test_predict_dataset(self, rng):
        data = {
            "X": rng.normal(size=(40, 10, 6)).astype(np.float32),
            "Y": rng.normal(size=(40, 10, 4)).astype(np.float32),
            "time_features": np.zeros((40, 4), np.int32),
        }
        ds = SlidingWindowDataset(data, L_in=16, L_out=4)
        preds = WindowMeanBaseline().predict_dataset(ds, L_out=4)
        assert preds.shape == (len(ds), 4, 10, 1)
        # sample 0 mean over its window's TEC channel
        np.testing.assert_allclose(
            preds[0, 0, :, 0], data["X"][:16, :, 0].mean(axis=0), rtol=1e-6
        )


class TestStreamingBaseline:
    def test_streamed_equals_materialized(self, rng):
        """evaluate_baseline_streaming (O(batch) memory, the wired eval path) must
        match evaluate_horizons on the fully materialized predictions exactly."""
        from tec_mollm_tpu.data.scaler import StandardScaler
        from tec_mollm_tpu.evaluation.harness import (
            evaluate_baseline_streaming,
            get_baseline_predictions,
            host_targets,
        )
        from tec_mollm_tpu.evaluation.metrics import evaluate_horizons

        # smooth series + noise so the baseline correlates with the targets
        # (pure-noise Pearson ~ 0 is ill-conditioned for a tolerance check)
        trend = np.sin(np.arange(70) / 8.0)[:, None]
        data = {
            "X": (trend[..., None] + rng.normal(0, 0.3, size=(70, 9, 6))).astype(
                np.float32
            ),
            "Y": (trend[..., None] + rng.normal(0, 0.3, size=(70, 9, 4))).astype(
                np.float32
            ),
            "time_features": np.zeros((70, 4), np.int32),
        }
        ds = SlidingWindowDataset(data, L_in=16, L_out=4)
        scaler = StandardScaler()
        scaler.mean_ = np.array([12.0])
        scaler.scale_ = np.array([7.0])

        exact = evaluate_horizons(
            host_targets(ds), get_baseline_predictions(ds, 4), scaler
        )
        # batch size chosen to NOT divide len(ds): exercises the padded final batch
        streamed = evaluate_baseline_streaming(ds, 4, scaler, batch_size=7)
        # per-batch sums are fp32 on device (host accumulation float64) — matches
        # within fp32 rounding, streaming.py's documented contract
        for k in ("mae_avg", "rmse_avg", "r2_score_avg", "pearson_r_avg"):
            assert streamed[k] == pytest.approx(exact[k], rel=1e-4, abs=1e-6), k
        for k in ("mae_by_horizon", "rmse_by_horizon"):
            np.testing.assert_allclose(streamed[k], exact[k], rtol=1e-4)


class TestHistoricalAverage:
    def test_climatology_per_node_slot(self, rng):
        """fit computes the mean per (node, tod-slot) exactly (baselines.py:22-33)."""
        T, N = 240, 7
        tec = rng.normal(20, 5, size=(T, N))
        slots = (np.arange(T) % 12).astype(np.int64)
        ha = HistoricalAverage().fit(tec, slots)
        for node in (0, 3):
            for slot in (0, 5, 11):
                expect = tec[slots == slot, node].mean()
                assert ha.averages[node, slot] == pytest.approx(expect)
        preds = ha.predict(np.array([3, 7]))
        np.testing.assert_allclose(preds[0], ha.averages[:, 3])
        np.testing.assert_allclose(preds[1], ha.averages[:, 7])

    def test_save_load(self, rng, tmp_path):
        tec = rng.normal(size=(48, 4))
        slots = (np.arange(48) % 12).astype(np.int64)
        ha = HistoricalAverage().fit(tec, slots)
        path = str(tmp_path / "ha.npz")
        ha.save(path)
        ha2 = HistoricalAverage.load(path)
        np.testing.assert_array_equal(ha.averages, ha2.averages)


class TestSeasonalNaive:
    def test_repeats_last_period(self, rng):
        x = rng.normal(size=(2, 24, 5)).astype(np.float32)
        sn = SeasonalNaive(period=12)
        preds = sn.predict_batch(x, L_out=18)
        assert preds.shape == (2, 18, 5, 1)
        np.testing.assert_array_equal(preds[:, :12, :, 0], x[:, 12:, :])
        np.testing.assert_array_equal(preds[:, 12:18, :, 0], x[:, 12:18, :])

    def test_short_window_raises(self):
        with pytest.raises(ValueError, match="shorter than period"):
            SeasonalNaive(period=12).predict_batch(np.zeros((1, 8, 3)), 4)


class TestSarimaGate:
    def test_clear_error_without_statsmodels(self):
        try:
            import statsmodels  # noqa: F401

            pytest.skip("statsmodels present; gate not exercised")
        except ImportError:
            pass
        with pytest.raises(ImportError, match="statsmodels"):
            sarima_baseline()


class TestImprovementReport:
    def test_percentages(self):
        from tec_mollm_tpu.evaluation.harness import improvement_report

        model = {"mae_avg": 2.0, "rmse_avg": 3.0, "r2_score_avg": 0.9, "pearson_r_avg": 0.95}
        base = {"mae_avg": 4.0, "rmse_avg": 4.0, "r2_score_avg": 0.5, "pearson_r_avg": 0.5}
        rep = improvement_report(model, base)
        assert rep["mae_improvement_pct"] == pytest.approx(50.0)
        assert rep["rmse_improvement_pct"] == pytest.approx(25.0)
        assert rep["r2_improvement_pct"] == pytest.approx(80.0)
        assert rep["pearson_improvement_pct"] == pytest.approx(90.0)
