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

    # Row-chunk size for the streaming paths. Full-archive fits/transforms used
    # to materialize float64 copies of multi-GB arrays (the 13-year Y split is
    # 1.37e9 values = 11 GB as float64); chunking keeps the working set small
    # and lets the dtype fast path below skip the float64 round-trip entirely.
    CHUNK_ROWS = 4_000_000

    def fit(self, x: np.ndarray) -> "StandardScaler":
        x = np.asarray(x)
        if x.ndim != 2:
            raise ValueError(f"fit expects 2D (n_samples, n_features), got {x.shape}")
        n = x.shape[0]
        # two-pass chunked mean/var in float64 accumulators — numerically the
        # same (to ~1e-15 rel) as np.mean/np.var on a float64 copy, without
        # ever materializing one
        total = np.zeros(x.shape[1], dtype=np.float64)
        for i in range(0, n, self.CHUNK_ROWS):
            total += x[i : i + self.CHUNK_ROWS].sum(axis=0, dtype=np.float64)
        mean = total / max(n, 1)
        sq = np.zeros(x.shape[1], dtype=np.float64)
        for i in range(0, n, self.CHUNK_ROWS):
            d = x[i : i + self.CHUNK_ROWS].astype(np.float64) - mean
            sq += np.einsum("ij,ij->j", d, d)
        scale = np.sqrt(sq / max(n, 1))  # ddof=0 like sklearn
        scale[scale == 0.0] = 1.0
        self.mean_ = mean
        self.scale_ = scale
        return self

    def _check(self) -> None:
        if self.mean_ is None or self.scale_ is None:
            raise RuntimeError("Scaler is not fitted")

    def _affine(
        self, x: np.ndarray, shift: np.ndarray, mul: np.ndarray, dtype
    ) -> np.ndarray:
        """(x - shift) * mul, chunked, computed and returned in `dtype`
        (float64 default = exact sklearn semantics; float32 avoids the
        full-size float64 temporaries on multi-GB archive splits)."""
        x = np.asarray(x)
        dtype = np.dtype(np.float64 if dtype is None else dtype)
        shift = shift.astype(dtype)
        mul = mul.astype(dtype)
        out = np.empty(x.shape, dtype=dtype)
        for i in range(0, max(x.shape[0], 1), self.CHUNK_ROWS):
            s = slice(i, i + self.CHUNK_ROWS)
            np.multiply(x[s] - shift, mul, out=out[s])
        return out

    def transform(self, x: np.ndarray, dtype=None) -> np.ndarray:
        self._check()
        return self._affine(x, self.mean_, 1.0 / self.scale_, dtype)

    def inverse_transform(self, x: np.ndarray, dtype=None) -> np.ndarray:
        self._check()
        # x * scale + mean == (x - (-mean/scale)) * scale
        return self._affine(x, -self.mean_ / self.scale_, self.scale_, dtype)

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
