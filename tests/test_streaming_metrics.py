"""Streaming on-device metrics must match the exact evaluate_horizons suite."""

import numpy as np
import pytest

import jax.numpy as jnp

from tec_mollm_tpu.data.scaler import StandardScaler
from tec_mollm_tpu.evaluation.metrics import evaluate_horizons
from tec_mollm_tpu.evaluation.streaming import StreamingHorizonMetrics


@pytest.fixture()
def data(rng):
    yt = np.clip(rng.normal(40, 15, size=(64, 12, 50, 1)), 0.5, 199.5)
    yp = yt + rng.normal(0, 4, size=yt.shape)
    scaler = StandardScaler().fit(yt.reshape(-1, 1))
    yts = scaler.transform(yt.reshape(-1, 1)).reshape(yt.shape).astype(np.float32)
    yps = scaler.transform(yp.reshape(-1, 1)).reshape(yp.shape).astype(np.float32)
    return yts, yps, scaler


class TestStreamingParity:
    def test_matches_exact_suite(self, data):
        yts, yps, scaler = data
        exact = evaluate_horizons(yts, yps, scaler)

        acc = StreamingHorizonMetrics(12, scaler, flush_every=3)
        for i in range(0, 64, 8):
            acc.update(jnp.asarray(yts[i : i + 8]), jnp.asarray(yps[i : i + 8]))
        got = acc.finalize()
        for key in ("mae_avg", "rmse_avg", "r2_score_avg", "pearson_r_avg"):
            assert got[key] == pytest.approx(exact[key], rel=2e-4), key
        np.testing.assert_allclose(
            got["mae_by_horizon"], exact["mae_by_horizon"], rtol=2e-4
        )

    def test_padded_rows_excluded(self, data):
        yts, yps, scaler = data
        acc_full = StreamingHorizonMetrics(12, scaler)
        acc_full.update(jnp.asarray(yts[:4]), jnp.asarray(yps[:4]))
        full = acc_full.finalize()

        # pad with garbage rows marked invalid
        garbage = np.full_like(yts[:2], 1e6)
        yts_p = np.concatenate([yts[:4], garbage])
        yps_p = np.concatenate([yps[:4], garbage])
        valid = jnp.asarray([True] * 4 + [False] * 2)
        acc_pad = StreamingHorizonMetrics(12, scaler)
        acc_pad.update(jnp.asarray(yts_p), jnp.asarray(yps_p), valid)
        padded = acc_pad.finalize()
        assert padded["mae_avg"] == pytest.approx(full["mae_avg"], rel=1e-5)
        assert padded["r2_score_avg"] == pytest.approx(full["r2_score_avg"], rel=1e-4)

    def test_clip_and_guard_semantics(self):
        """preds clip to [0,200] and scaled non-finite preds zero out, exactly like
        the reference-exact suite."""
        scaler = StandardScaler(mean=np.array([0.0]), scale=np.array([1.0]))
        yt = np.array([[[250.0]], [[100.0]], [[50.0]]], dtype=np.float32)[..., None]
        yp = np.array([[[250.0]], [[-50.0]], [[np.inf]]], dtype=np.float32)[..., None]
        exact = evaluate_horizons(yt, yp, scaler)
        acc = StreamingHorizonMetrics(1, scaler)
        acc.update(jnp.asarray(yt), jnp.asarray(yp))
        got = acc.finalize()
        assert got["mae_avg"] == pytest.approx(exact["mae_avg"], rel=1e-6)

    def test_no_scaler(self, data):
        yts, yps, _ = data
        exact = evaluate_horizons(yts, yps, None)
        acc = StreamingHorizonMetrics(12, None)
        acc.update(jnp.asarray(yts), jnp.asarray(yps))
        got = acc.finalize()
        assert got["rmse_avg"] == pytest.approx(exact["rmse_avg"], rel=2e-4)
