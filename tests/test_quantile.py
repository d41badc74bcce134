"""Probabilistic (quantile) head — beyond-reference uncertainty quantification.

The reference model is a point forecaster (modules.py PredictionHead -> one
value per horizon). ModelConfig.quantiles adds an opt-in pinball-loss head
emitting one forecast per level; these tests pin the config contract, the
pinball loss math, the non-crossing model output, training behavior, and the
streaming quantile metrics against plain-numpy references.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tec_mollm_tpu.config import tiny_config
from tec_mollm_tpu.data.dataset import SlidingWindowDataset
from tec_mollm_tpu.data.scaler import StandardScaler
from tec_mollm_tpu.data.synthetic import synthetic_processed_split
from tec_mollm_tpu.models import TECMoLLM
from tec_mollm_tpu.training.loss import pinball_loss
from tec_mollm_tpu.training.train_state import (
    create_train_state,
    make_eval_step,
    make_train_step,
    point_forecast,
)

QLEVELS = (0.1, 0.5, 0.9)


def quantile_cfg():
    cfg = tiny_config()
    return dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, quantiles=QLEVELS)
    ).resolved()


class TestConfigContract:
    def test_properties(self):
        cfg = quantile_cfg()
        assert cfg.model.num_outputs == 3
        assert cfg.model.median_index == 1
        point = tiny_config()
        assert point.model.num_outputs == 1
        assert point.model.median_index == 0

    def test_json_round_trip(self):
        """config.json written by train.py --quantiles must restore a usable
        tuple (jit static args require hashability)."""
        from tec_mollm_tpu.config import Config

        cfg = quantile_cfg()
        back = Config.from_json(cfg.to_json()).resolved()
        assert back.model.quantiles == QLEVELS
        assert isinstance(back.model.quantiles, tuple)
        assert back.model.median_index == 1

    @pytest.mark.parametrize(
        "bad",
        [
            (0.0, 0.5, 0.9),   # boundary not allowed
            (0.1, 0.5, 1.0),   # boundary not allowed
            (0.5, 0.5),        # not strictly increasing
            (0.9, 0.5, 0.1),   # decreasing
            (0.1, 0.9),        # missing the 0.5 point forecast
        ],
    )
    def test_invalid_levels_raise(self, bad):
        cfg = tiny_config()
        with pytest.raises(ValueError, match="quantiles"):
            dataclasses.replace(
                cfg, model=dataclasses.replace(cfg.model, quantiles=bad)
            ).resolved()


class TestPinballLoss:
    def test_matches_numpy_reference(self, rng):
        y = rng.normal(size=(4, 6, 1)).astype(np.float32)
        p = rng.normal(size=(4, 6, 3)).astype(np.float32)
        got = float(pinball_loss(jnp.asarray(p), jnp.asarray(y), QLEVELS))
        q = np.asarray(QLEVELS, np.float32)
        err = y - p
        want = np.maximum(q * err, (q - 1.0) * err).mean()
        assert got == pytest.approx(float(want), rel=1e-6)

    def test_median_level_is_half_mae(self, rng):
        """Pinball at q=0.5 is |err|/2 — ties the probabilistic objective to
        the reference's point metrics."""
        y = rng.normal(size=(8, 5, 1)).astype(np.float32)
        p = rng.normal(size=(8, 5, 1)).astype(np.float32)
        got = float(pinball_loss(jnp.asarray(p), jnp.asarray(y), (0.5,)))
        assert got == pytest.approx(float(np.abs(y - p).mean()) / 2, rel=1e-6)

    def test_weighted_masks_rows(self, rng):
        y = rng.normal(size=(4, 3, 1)).astype(np.float32)
        p = rng.normal(size=(4, 3, 3)).astype(np.float32)
        w = np.array([1.0, 1.0, 0.0, 0.0], np.float32)[:, None, None]
        full = float(
            pinball_loss(jnp.asarray(p[:2]), jnp.asarray(y[:2]), QLEVELS)
        )
        masked = float(
            pinball_loss(
                jnp.asarray(p), jnp.asarray(y), QLEVELS, weights=jnp.asarray(w)
            )
        )
        assert masked == pytest.approx(full, rel=1e-6)

    def test_asymmetry_direction(self):
        """q=0.9 penalizes under-prediction (y above p) 9x over-prediction —
        the property that pushes the 0.9 head above the data."""
        y = jnp.ones((1, 1, 1))
        under = float(pinball_loss(jnp.zeros((1, 1, 1)), y, (0.9,)))  # p below y
        over = float(pinball_loss(2 * jnp.ones((1, 1, 1)), y, (0.9,)))
        assert under == pytest.approx(0.9, rel=1e-6)
        assert over == pytest.approx(0.1, rel=1e-6)


@pytest.fixture(scope="module")
def qtrain_setup(tiny_graph):
    cfg = quantile_cfg()
    m = cfg.model
    split = synthetic_processed_split(
        num_windows=40, L_in=cfg.train.L_in, L_out=cfg.train.L_out,
        num_nodes=m.num_nodes, seed=0,
    )
    ds = SlidingWindowDataset(split, cfg.train.L_in, cfg.train.L_out, stride=1)
    model = TECMoLLM(m)
    graph = (
        jnp.asarray(tiny_graph.neighbors),
        jnp.asarray(tiny_graph.neighbor_mask),
    )
    sample = ds.gather_batch(np.arange(4))
    state, tx, mask = create_train_state(model, cfg, jax.random.key(0), sample, graph)
    return cfg, model, ds, graph, state, tx, mask


class TestQuantileModel:
    def test_output_shape_and_noncrossing(self, qtrain_setup):
        cfg, model, ds, graph, state, _, _ = qtrain_setup
        batch = jax.tree.map(jnp.asarray, ds.gather_batch(np.arange(2)))
        preds = model.apply(
            {"params": state.params},
            batch["x"], batch["time_features"], *graph, deterministic=True,
        )
        B, L_out, N = 2, cfg.train.L_out, cfg.model.num_nodes
        assert preds.shape == (B, L_out, N, 3)
        p = np.asarray(preds)
        # non-crossing guarantee: levels monotone non-decreasing along Q
        assert np.all(np.diff(p, axis=-1) >= 0)

    def test_point_forecast_slices_median(self, qtrain_setup):
        cfg, model, ds, graph, state, _, _ = qtrain_setup
        batch = jax.tree.map(jnp.asarray, ds.gather_batch(np.arange(2)))
        preds = model.apply(
            {"params": state.params},
            batch["x"], batch["time_features"], *graph, deterministic=True,
        )
        pt = point_forecast(preds, cfg)
        assert pt.shape == preds.shape[:-1] + (1,)
        np.testing.assert_array_equal(
            np.asarray(pt)[..., 0], np.asarray(preds)[..., cfg.model.median_index]
        )

    def test_composes_with_revin(self, qtrain_setup):
        """--revin --quantiles together: the affine inverse (sd>0) keeps the
        sorted levels monotone, and with the head's output layer zeroed every
        level collapses exactly to the per-window mean — the HA starting
        point that makes RevIN useful under level shift."""
        cfg, _, ds, graph, state, _, _ = qtrain_setup
        model = TECMoLLM(dataclasses.replace(cfg.model, revin=True))
        batch = jax.tree.map(jnp.asarray, ds.gather_batch(np.arange(2)))
        preds = model.apply(
            {"params": state.params},
            batch["x"], batch["time_features"], *graph, deterministic=True,
        )
        p = np.asarray(preds)
        assert p.shape[-1] == 3
        assert np.all(np.diff(p, axis=-1) >= 0)

        zeroed = jax.tree_util.tree_map_with_path(
            lambda path, v: jnp.zeros_like(v)
            if any(getattr(k, "key", None) == "fc2" for k in path)
            else v,
            state.params,
        )
        out = np.asarray(
            model.apply(
                {"params": zeroed},
                batch["x"], batch["time_features"], *graph, deterministic=True,
            )
        )
        ha = np.asarray(batch["x"])[..., 0].mean(axis=1)  # (B, N)
        np.testing.assert_allclose(
            out, np.broadcast_to(ha[:, None, :, None], out.shape), atol=1e-5
        )

    def test_train_step_decreases_pinball(self, qtrain_setup):
        cfg, model, ds, graph, state, tx, _ = qtrain_setup
        step = jax.jit(make_train_step(model, cfg, tx))
        batch = jax.tree.map(
            jnp.asarray,
            ds.gather_batch(
                np.arange(cfg.train.accumulation_steps * cfg.train.batch_size)
            ),
        )
        losses, s = [], state
        for _ in range(8):
            s, metrics = step(s, batch, graph)
            losses.append(float(metrics["loss"]))
        assert losses[-1] < losses[0]

    def test_eval_step_uses_pinball_and_returns_all_levels(self, qtrain_setup):
        cfg, model, ds, graph, state, _, _ = qtrain_setup
        eval_step = jax.jit(make_eval_step(model, cfg))
        batch = jax.tree.map(jnp.asarray, ds.gather_batch(np.arange(2)))
        loss, preds, trues = eval_step(state.params, batch, graph)
        assert preds.shape[-1] == 3
        assert trues.shape[-1] == 1
        want = float(
            pinball_loss(preds, trues, QLEVELS,
                         weights=jnp.ones(preds.shape[:1] + (1, 1, 1)))
        )
        assert float(loss) == pytest.approx(want, rel=1e-5)


class TestStreamingQuantileMetrics:
    def _numpy_reference(self, yts, yps, scaler, valid=None):
        """Physical-unit pinball + calibration with the shipped guard/clip
        semantics (streaming.py batch_quantile_stats)."""
        scale, mean = scaler.scale_[0], scaler.mean_[0]
        yt = np.nan_to_num(yts.astype(np.float64) * scale + mean,
                           nan=0.0, posinf=100.0, neginf=0.0)
        yp = np.nan_to_num(yps.astype(np.float64), nan=0.0, posinf=0.0, neginf=0.0)
        yp = yp * scale + mean
        yp = np.clip(np.nan_to_num(yp, nan=0.0, posinf=100.0, neginf=0.0), 0.0, 200.0)
        if valid is not None:
            yt, yp = yt[valid], yp[valid]
        q = np.asarray(QLEVELS)
        err = yt[..., None] - yp
        pinball = np.maximum(q * err, (q - 1.0) * err)
        below = (yt[..., None] <= yp).astype(np.float64)
        # average over batch and nodes per (horizon, level)
        return pinball.mean(axis=(0, 2)), below.mean(axis=(0, 2))

    def test_matches_numpy_reference(self, rng):
        from tec_mollm_tpu.evaluation.streaming import StreamingQuantileMetrics

        yt = np.clip(rng.normal(40, 15, size=(48, 4, 30)), 0.5, 199.5)
        spread = np.array([-5.0, 0.0, 5.0])
        yp = yt[..., None] + spread + rng.normal(0, 3, size=yt.shape + (3,))
        scaler = StandardScaler().fit(yt.reshape(-1, 1))
        yts = ((yt - scaler.mean_[0]) / scaler.scale_[0]).astype(np.float32)
        yps = ((yp - scaler.mean_[0]) / scaler.scale_[0]).astype(np.float32)

        acc = StreamingQuantileMetrics(4, QLEVELS, scaler, flush_every=3)
        for i in range(0, 48, 8):
            acc.update(jnp.asarray(yts[i : i + 8]), jnp.asarray(yps[i : i + 8]))
        got = acc.finalize()

        pin_ref, below_ref = self._numpy_reference(yts, yps, scaler)
        np.testing.assert_allclose(
            got["pinball_by_horizon_level"], pin_ref, rtol=2e-4
        )
        np.testing.assert_allclose(
            got["calibration_by_level"], below_ref.mean(axis=0), rtol=2e-4
        )
        assert got["interval_nominal"] == pytest.approx(0.8)
        cover_ref = (below_ref[:, -1] - below_ref[:, 0]).mean()
        assert got["interval_coverage"] == pytest.approx(float(cover_ref), rel=2e-4)

    def test_padded_rows_excluded(self, rng):
        from tec_mollm_tpu.evaluation.streaming import StreamingQuantileMetrics

        yt = np.clip(rng.normal(40, 10, size=(6, 2, 8)), 1, 199).astype(np.float32)
        yp = (yt[..., None] + np.array([-3.0, 0.0, 3.0])).astype(np.float32)
        scaler = StandardScaler(mean=np.array([0.0]), scale=np.array([1.0]))

        clean = StreamingQuantileMetrics(2, QLEVELS, scaler)
        clean.update(jnp.asarray(yt[:4]), jnp.asarray(yp[:4]))
        want = clean.finalize()

        garbage_t = np.full_like(yt[:2], 1e6)
        garbage_p = np.full_like(yp[:2], -1e6)
        padded = StreamingQuantileMetrics(2, QLEVELS, scaler)
        padded.update(
            jnp.asarray(np.concatenate([yt[:4], garbage_t])),
            jnp.asarray(np.concatenate([yp[:4], garbage_p])),
            jnp.asarray([True] * 4 + [False] * 2),
        )
        got = padded.finalize()
        assert got["pinball_avg"] == pytest.approx(want["pinball_avg"], rel=1e-5)
        np.testing.assert_allclose(
            got["calibration_by_level"], want["calibration_by_level"], rtol=1e-5
        )

    def test_perfect_calibration(self, rng):
        """Forecast quantiles computed FROM the data distribution calibrate to
        their nominal levels."""
        from tec_mollm_tpu.evaluation.streaming import StreamingQuantileMetrics

        scaler = StandardScaler(mean=np.array([0.0]), scale=np.array([1.0]))
        yt = rng.uniform(10, 90, size=(512, 1, 4)).astype(np.float32)
        # true quantiles of U(10, 90)
        qs = np.array([10 + 80 * q for q in QLEVELS], np.float32)
        yp = np.broadcast_to(qs, yt.shape + (3,)).astype(np.float32)
        acc = StreamingQuantileMetrics(1, QLEVELS, scaler)
        acc.update(jnp.asarray(yt), jnp.asarray(yp))
        got = acc.finalize()
        np.testing.assert_allclose(
            got["calibration_by_level"], QLEVELS, atol=0.05
        )
        assert got["interval_coverage"] == pytest.approx(0.8, abs=0.05)
