"""Tests for the opt-in solar-cycle realism mode of the synthetic generator.

The default generator (synthetic.py) produces stationary TEC (diurnal +
seasonal + noise) and space-weather indices that are uninformative random
walks — fine for shape/pipeline tests, meaningless for multi-year accuracy
experiments. `solar_cycle=True` adds an 11-year activity cycle and physically
couples the indices to TEC (reference data semantics: data_loader.py:10-82
stacks exactly these 5 indices as model inputs). These tests pin:

  1. the default path is unchanged (bit-level regression vs the original
     formula, so experiments recorded in BASELINE.md stay reproducible);
  2. the activity cycle creates a real train/test distribution shift;
  3. F10.7 tracks TEC amplitude (the index channels carry signal);
  4. storms (Kp spikes) are followed by lagged TEC depletions.
"""

from __future__ import annotations

import numpy as np
import pytest

from tec_mollm_tpu.data.synthetic import grid_coordinates, synthetic_raw_data


def _year_times(year: int, days: int = 60) -> np.ndarray:
    t0 = np.datetime64(f"{year}-03-01T00:00:00", "s")
    return t0 + np.arange(days * 12) * np.timedelta64(7200, "s")


class TestDefaultPathUnchanged:
    def test_bit_identical_to_original_formula(self):
        """solar_cycle=False must reproduce the original generator exactly
        (same rng draw order), so all BASELINE.md synthetic runs remain
        regenerable."""
        num_steps, gh, gw, seed = 180, 7, 9, 3
        got = synthetic_raw_data(num_steps=num_steps, grid_h=gh, grid_w=gw, seed=seed)

        rng = np.random.default_rng(seed)
        lat, lon = grid_coordinates(gh, gw)
        times = np.datetime64("2014-01-01T00:00:00", "s") + np.arange(
            num_steps
        ) * np.timedelta64(7200, "s")
        hours = times.astype("datetime64[h]").astype(np.int64) % 24
        days = times.astype("datetime64[D]").astype(np.int64)
        diurnal = np.sin(2 * np.pi * (hours[:, None, None] - 14) / 24.0)
        seasonal = np.cos(2 * np.pi * days[:, None, None] / 365.25)
        lat_profile = 30.0 - 0.3 * np.abs(lat[None, :, None] - lat.mean())
        tec = (
            lat_profile
            + 12.0 * diurnal
            + 5.0 * seasonal
            + rng.normal(0, 1.5, size=(num_steps, gh, gw))
        )
        tec = np.clip(tec, 0.0, 200.0).astype(np.float32)
        walks = np.cumsum(rng.normal(0, 1, size=(num_steps, 5)), axis=0)
        base = np.array([200.0, -20.0, 120.0, 3.0, 15.0])
        scale = np.array([50.0, 10.0, 20.0, 0.5, 5.0])
        indices = (
            base + scale * walks / np.sqrt(np.arange(1, num_steps + 1))[:, None]
        ).astype(np.float32)

        np.testing.assert_array_equal(got["tec"], tec)
        np.testing.assert_array_equal(got["space_weather_indices"], indices)


class TestSolarCycle:
    @pytest.fixture(scope="class")
    def max_year(self):
        return synthetic_raw_data(
            num_steps=60 * 12, grid_h=5, grid_w=7, seed=0,
            times=_year_times(2014), solar_cycle=True,
        )

    @pytest.fixture(scope="class")
    def min_year(self):
        return synthetic_raw_data(
            num_steps=60 * 12, grid_h=5, grid_w=7, seed=0,
            times=_year_times(2020), solar_cycle=True,
        )

    def test_deterministic(self):
        a = synthetic_raw_data(num_steps=100, grid_h=3, grid_w=4, seed=7,
                               solar_cycle=True)
        b = synthetic_raw_data(num_steps=100, grid_h=3, grid_w=4, seed=7,
                               solar_cycle=True)
        np.testing.assert_array_equal(a["tec"], b["tec"])
        np.testing.assert_array_equal(
            a["space_weather_indices"], b["space_weather_indices"]
        )

    def test_activity_shift_between_solar_max_and_min(self, max_year, min_year):
        """2014 (solar max) TEC must sit well above 2020 (solar min): the
        multi-year distribution shift the default generator lacks."""
        hi, lo = max_year["tec"].mean(), min_year["tec"].mean()
        assert hi > 1.5 * lo, (hi, lo)

    def test_f107_tracks_activity(self, max_year, min_year):
        f_hi = max_year["space_weather_indices"][:, 2].mean()
        f_lo = min_year["space_weather_indices"][:, 2].mean()
        assert f_hi > 180 and f_lo < 100, (f_hi, f_lo)

    def test_indices_physical_ranges(self, max_year):
        ae, dst, f107, kp, ap = max_year["space_weather_indices"].T
        assert 0 <= kp.min() and kp.max() <= 9
        assert dst.mean() < 0
        assert ae.min() > -200 and ap.min() > 0

    def test_storms_depress_tec_with_lag(self, max_year):
        """High-Kp steps must be followed (3-step lag) by TEC sitting below
        its same-hour-of-day typical value — the coupling that makes the
        index channels predictive."""
        tec = max_year["tec"].mean(axis=(1, 2))
        kp = max_year["space_weather_indices"][:, 3]
        hours = max_year["time"].astype("datetime64[h]").astype(np.int64) % 24
        # residual vs per-hour-of-day median removes the diurnal cycle
        resid = tec.copy()
        for h in np.unique(hours):
            m = hours == h
            resid[m] -= np.median(tec[m])
        storm_proxy = np.maximum(kp - 2.5, 0.0)
        lagged = np.concatenate([np.zeros(3), storm_proxy[:-3]])
        if lagged.max() == 0:
            pytest.skip("no storms drawn at this seed")
        r = np.corrcoef(lagged, resid)[0, 1]
        assert r < -0.2, r

    def test_preprocess_cli_flag(self, tmp_path):
        """--solar-cycle flows through run_preprocess and produces splits with
        the activity-level shift (train 2013-21 mean != test 2024+ mean)."""
        from tec_mollm_tpu.config import DataConfig
        from tec_mollm_tpu.data.preprocess import run_preprocess

        out = str(tmp_path / "proc")
        sizes = run_preprocess(
            DataConfig(horizon=3), out, synthetic_steps=400,
            synthetic_grid=(4, 5), solar_cycle=True,
        )
        assert set(sizes) == {"train", "val", "test"} and min(sizes.values()) > 0
