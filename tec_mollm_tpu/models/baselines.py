"""Baseline forecasters.

The reference ships two Historical-Average variants (SURVEY.md §2.d.5):
  * WindowMeanBaseline — the wired one (test.py:46-71): prediction = mean of the
    input window's TEC channel, repeated for all L_out horizons. This produces the
    reported improvement-% comparisons.
  * HistoricalAverage — per-(node, time-of-day-slot) climatology
    (baselines.py:9-45), defined but never imported by train/test.
  * SarimaBaseline — per-node SARIMAX (baselines.py:47-72), also unwired; gated here
    behind an optional statsmodels import (not in the TPU image), with
    SeasonalNaive as the always-available seasonal point forecaster.
"""

from __future__ import annotations

import numpy as np


class WindowMeanBaseline:
    """prediction[b, h, n] = mean_t(window_tec[b, t, n]) for every horizon h."""

    def predict_batch(self, x_window_tec: np.ndarray, L_out: int) -> np.ndarray:
        """x_window_tec: (B, L_in, N) -> (B, L_out, N, 1)."""
        mean = x_window_tec.mean(axis=1)  # (B, N)
        return np.repeat(mean[:, None, :, None], L_out, axis=1)

    def predict_dataset(self, dataset, L_out: int, tec_channel: int = 0) -> np.ndarray:
        """All windows of a SlidingWindowDataset -> (num_samples, L_out, N, 1)."""
        idxs = np.arange(len(dataset))
        batch = dataset.gather_batch(idxs)
        return self.predict_batch(batch["x"][..., tec_channel], L_out)


class HistoricalAverage:
    """Per-(node, tod-slot) climatology (reference baselines.py:9-45), vectorized."""

    def __init__(self, slots_per_day: int = 12):
        self.slots = slots_per_day
        self.averages: np.ndarray | None = None  # (N, slots)

    def fit(self, tec: np.ndarray, tod_slots: np.ndarray) -> "HistoricalAverage":
        """tec (T, N); tod_slots (T,) int in [0, slots)."""
        n = tec.shape[1]
        sums = np.zeros((n, self.slots))
        counts = np.zeros(self.slots)
        np.add.at(sums.T, tod_slots, tec)
        np.add.at(counts, tod_slots, 1)
        with np.errstate(invalid="ignore", divide="ignore"):
            self.averages = (sums / counts[None, :])
        return self

    def predict(self, tod_slots: np.ndarray) -> np.ndarray:
        """tod_slots (T,) -> (T, N)."""
        if self.averages is None:
            raise RuntimeError("fit first")
        return self.averages[:, tod_slots].T

    def save(self, path: str) -> None:
        np.savez(path, averages=self.averages, slots=self.slots)

    @classmethod
    def load(cls, path: str) -> "HistoricalAverage":
        with np.load(path) as d:
            obj = cls(slots_per_day=int(d["slots"]))
            obj.averages = d["averages"]
        return obj


class SeasonalNaive:
    """prediction[t+h] = value[t + h - period]: repeat the matching slot from the
    most recent full period of the input window. Always-available substitute for the
    reference's unwired SARIMA baseline."""

    def __init__(self, period: int = 12):
        self.period = period

    def predict_batch(self, x_window_tec: np.ndarray, L_out: int) -> np.ndarray:
        """x_window_tec: (B, L_in, N) -> (B, L_out, N, 1)."""
        b, L_in, n = x_window_tec.shape
        if L_in < self.period:
            raise ValueError(f"window {L_in} shorter than period {self.period}")
        last_period = x_window_tec[:, L_in - self.period :, :]  # (B, period, N)
        reps = -(-L_out // self.period)
        tiled = np.tile(last_period, (1, reps, 1))[:, :L_out, :]
        return tiled[..., None]


def sarima_baseline(*args, **kwargs):
    """Per-node SARIMAX(1,1,1)(1,1,1,12) via statsmodels, as in reference
    baselines.py:47-72. statsmodels is NOT in the TPU image — use the
    first-party batched implementation instead (models/sarima.py, wired into
    `test.py --baseline sarima`), which fits all nodes in one jitted CSS
    program rather than a per-node solver loop."""
    try:
        from statsmodels.tsa.statespace.sarimax import SARIMAX  # noqa: F401
    except ImportError as e:
        raise ImportError(
            "statsmodels is not available in this environment; use the "
            "first-party models/sarima.py (test.py --baseline sarima), "
            "SeasonalNaive, or HistoricalAverage"
        ) from e

    class SarimaBaseline:
        def __init__(self, order=(1, 1, 1), seasonal_order=(1, 1, 1, 12)):
            self.models = {}
            self.order = order
            self.seasonal_order = seasonal_order

        def fit(self, tec: np.ndarray, node_indices: list[int]):
            for idx in node_indices:
                model = SARIMAX(
                    tec[:, idx], order=self.order, seasonal_order=self.seasonal_order
                )
                self.models[idx] = model.fit(disp=False)
            return self

        def predict(self, node_indices: list[int], steps: int) -> dict[int, np.ndarray]:
            return {
                idx: self.models[idx].forecast(steps=steps)
                for idx in node_indices
                if idx in self.models
            }

    return SarimaBaseline(*args, **kwargs)
