"""Native C batch assembler tests: parity with the numpy path + error handling."""

import numpy as np
import pytest

from tec_mollm_tpu.data import native_loader
from tec_mollm_tpu.data.dataset import SlidingWindowDataset

pytestmark = pytest.mark.skipif(
    not native_loader.available(), reason="g++ unavailable; numpy fallback in use"
)


def _split(T=60, N=35, C=6, L_out=4, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "X": rng.normal(size=(T, N, C)).astype(np.float32),
        "Y": rng.normal(size=(T, N, L_out)).astype(np.float32),
        "time_features": rng.integers(0, 12, size=(T, 4)).astype(np.int32),
    }


class TestNativeGather:
    def test_matches_numpy_path(self):
        data = _split()
        ds_native = SlidingWindowDataset(data, L_in=16, L_out=4, stride=2, use_native=True)
        ds_numpy = SlidingWindowDataset(data, L_in=16, L_out=4, stride=2, use_native=False)
        idxs = np.array([0, 3, 7, 11])
        a = ds_native.gather_batch(idxs)
        b = ds_numpy.gather_batch(idxs)
        for key in ("x", "y", "time_features"):
            np.testing.assert_array_equal(a[key], b[key])

    def test_single_and_many_threads(self):
        data = _split(T=200)
        starts = np.arange(0, 160, 5, dtype=np.int64)
        one = native_loader.gather_windows(
            data["X"], data["Y"], data["time_features"], starts, 16, num_threads=1
        )
        many = native_loader.gather_windows(
            data["X"], data["Y"], data["time_features"], starts, 16, num_threads=8
        )
        for key in one:
            np.testing.assert_array_equal(one[key], many[key])

    def test_out_of_bounds_start_rejected(self):
        data = _split(T=30)
        with pytest.raises(RuntimeError, match="code 2"):
            native_loader.gather_windows(
                data["X"], data["Y"], data["time_features"],
                np.array([20], dtype=np.int64), 16,
            )

    def test_non_contiguous_input_rejected(self):
        """The C side trusts raw pointers; a strided view must be refused, not
        read as garbage (code-review r3)."""
        data = _split(T=30)
        strided_x = data["X"][::2]  # non-contiguous view
        with pytest.raises(ValueError, match="contiguous"):
            native_loader.gather_windows(
                strided_x, data["Y"], data["time_features"],
                np.array([0], dtype=np.int64), 8,
            )
        with pytest.raises(ValueError, match="float32"):
            native_loader.gather_windows(
                data["X"].astype(np.float64), data["Y"], data["time_features"],
                np.array([0], dtype=np.int64), 8,
            )

    def test_standardize_non_contiguous_refused_not_silent(self):
        """standardize_inplace on a strided view used to standardize a
        reshape-COPY and report success while leaving the caller's array
        untouched (code-review r3) — it must return False instead."""
        rng = np.random.default_rng(2)
        base = rng.normal(0, 1, size=(100, 12)).astype(np.float32)
        view = base[:, ::2]  # non-contiguous, shape (100, 6)
        before = view.copy()
        ok = native_loader.standardize_inplace(
            view, np.zeros(6, np.float64), np.full(6, 2.0, np.float64)
        )
        assert ok is False
        np.testing.assert_array_equal(view, before)

    def test_standardize_matches_numpy(self):
        rng = np.random.default_rng(1)
        x = rng.normal(3, 2, size=(1000, 6)).astype(np.float32)
        mean = x.mean(0).astype(np.float64)
        scale = x.std(0).astype(np.float64)
        expect = ((x - mean) / scale).astype(np.float32)
        got = x.copy()
        assert native_loader.standardize_inplace(got, mean, scale)
        np.testing.assert_allclose(got, expect, atol=1e-5)
