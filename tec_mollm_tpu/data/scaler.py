"""First-party standardization, replacing sklearn.preprocessing.StandardScaler.

The reference fits an sklearn StandardScaler on train features / targets and persists it
with joblib (feature_engineering.py:169-177, preprocess.py:45-62 of /root/reference).
This implementation matches sklearn's semantics (per-column mean, ddof=0 std, zero-variance
columns scale to 1.0) but persists as plain ``.npz`` so no pickle is involved.
"""

from __future__ import annotations

import numpy as np


class StandardScaler:
    """Per-feature z-score scaler: transform(x) = (x - mean) / scale.

    Columns with zero variance get scale 1.0, matching sklearn's behavior.
    """

    def __init__(self, mean: np.ndarray | None = None, scale: np.ndarray | None = None):
        self.mean_ = None if mean is None else np.asarray(mean, dtype=np.float64)
        self.scale_ = None if scale is None else np.asarray(scale, dtype=np.float64)

    def fit(self, x: np.ndarray) -> "StandardScaler":
        x = np.asarray(x, dtype=np.float64)
        if x.ndim != 2:
            raise ValueError(f"fit expects 2D (n_samples, n_features), got {x.shape}")
        self.mean_ = x.mean(axis=0)
        var = x.var(axis=0)  # ddof=0 like sklearn
        scale = np.sqrt(var)
        scale[scale == 0.0] = 1.0
        self.scale_ = scale
        return self

    def _check(self) -> None:
        if self.mean_ is None or self.scale_ is None:
            raise RuntimeError("Scaler is not fitted")

    def transform(self, x: np.ndarray) -> np.ndarray:
        self._check()
        x = np.asarray(x)
        return ((x - self.mean_) / self.scale_).astype(np.float64)

    def inverse_transform(self, x: np.ndarray) -> np.ndarray:
        self._check()
        x = np.asarray(x)
        return (x * self.scale_ + self.mean_).astype(np.float64)

    def fit_transform(self, x: np.ndarray) -> np.ndarray:
        return self.fit(x).transform(x)

    # ---- persistence (replaces joblib.dump/load of the sklearn object) ----

    def save(self, path: str) -> None:
        self._check()
        np.savez(path, mean=self.mean_, scale=self.scale_)

    @classmethod
    def load(cls, path: str) -> "StandardScaler":
        with np.load(path) as data:
            return cls(mean=data["mean"], scale=data["scale"])
