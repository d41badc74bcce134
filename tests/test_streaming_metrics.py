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


class TestStreamingPrecisionAtScale:
    """VERDICT r2 #9: the per-batch fp32 sums (notably sum y^2 ~ 5e8 at the real
    2-year stride-1 split) are the term closest to the fp32 precision edge.
    Differential test: the shipped fp32-on-device accumulation vs an exact
    float64 host computation at realistic magnitudes — flagship node count
    (2911), B=16, values ~ N(40, 15) TECU, ~1k batches through the default
    flush_every=128 chunking."""

    def test_fp32_device_vs_float64_host(self, rng):
        n_unique, repeats = 8, 128     # 1024 batches total
        B, L, N = 16, 12, 2911
        scaler = StandardScaler()
        scaler.mean_ = np.array([40.0])
        scaler.scale_ = np.array([15.0])

        yts, yps = [], []
        for _ in range(n_unique):
            yt = np.clip(rng.normal(40, 15, size=(B, L, N, 1)), 0.0, 200.0)
            yp = yt + rng.normal(0, 4, size=yt.shape)
            yts.append(((yt - 40.0) / 15.0).astype(np.float32))
            yps.append(((yp - 40.0) / 15.0).astype(np.float32))

        acc = StreamingHorizonMetrics(L, scaler)  # default flush_every=128
        for r in range(repeats):
            for u in range(n_unique):
                acc.update(jnp.asarray(yts[u]), jnp.asarray(yps[u]))
        got = acc.finalize()

        # exact float64 reference with identical guard/clip semantics
        stats = np.zeros((L, 8), dtype=np.float64)
        for u in range(n_unique):
            yt = yts[u].astype(np.float64).reshape(B, L, -1) * 15.0 + 40.0
            yp = np.clip(
                yps[u].astype(np.float64).reshape(B, L, -1) * 15.0 + 40.0,
                0.0, 200.0,
            )
            err = yp - yt
            stats[:, 0] += B * yt.shape[-1]
            stats[:, 1] += np.abs(err).sum(axis=(0, 2))
            stats[:, 2] += (err ** 2).sum(axis=(0, 2))
            stats[:, 3] += yt.sum(axis=(0, 2))
            stats[:, 4] += (yt ** 2).sum(axis=(0, 2))
            stats[:, 5] += yp.sum(axis=(0, 2))
            stats[:, 6] += (yp ** 2).sum(axis=(0, 2))
            stats[:, 7] += (yt * yp).sum(axis=(0, 2))
        stats *= repeats  # identical batches contribute identically in exact math
        n = stats[:, 0]
        mae = (stats[:, 1] / n).mean()
        rmse = np.sqrt(stats[:, 2] / n).mean()
        ss_tot = stats[:, 4] - stats[:, 3] ** 2 / n
        r2 = (1.0 - stats[:, 2] / ss_tot).mean()
        var_t = stats[:, 4] / n - (stats[:, 3] / n) ** 2
        var_p = stats[:, 6] / n - (stats[:, 5] / n) ** 2
        cov = stats[:, 7] / n - (stats[:, 3] / n) * (stats[:, 5] / n)
        pearson = (cov / np.sqrt(var_t * var_p)).mean()

        assert got["mae_avg"] == pytest.approx(mae, rel=1e-5)
        assert got["rmse_avg"] == pytest.approx(rmse, rel=1e-5)
        # r2/pearson divide cancellation-prone moment differences; fp32
        # per-batch moments cost a few more digits
        assert got["r2_score_avg"] == pytest.approx(r2, rel=1e-3, abs=1e-4)
        assert got["pearson_r_avg"] == pytest.approx(pearson, rel=1e-3, abs=1e-4)
