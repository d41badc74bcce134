"""Data foundation tests: scaler, HDF5 ingestion, splits, features, targets, windows.

Mirrors the reference's inline asserts (data_loader.py:209-240,
feature_engineering.py:196-218) but hermetically against synthetic fixtures.
"""

import numpy as np
import pytest

from tec_mollm_tpu.data import (
    StandardScaler,
    load_and_split_data,
    SlidingWindowDataset,
    BatchLoader,
)
from tec_mollm_tpu.data.features import (
    build_split_tensors,
    construct_feature_tensor,
    construct_target_tensor,
    extract_time_features,
    standardize_features,
    standardize_targets,
)
from tec_mollm_tpu.data.synthetic import synthetic_raw_data


class TestStandardScaler:
    def test_matches_sklearn(self, rng):
        from sklearn.preprocessing import StandardScaler as SkScaler

        x = rng.normal(3.0, 2.5, size=(100, 6))
        x[:, 2] = 7.0  # zero-variance column
        ours = StandardScaler().fit(x)
        theirs = SkScaler().fit(x)
        np.testing.assert_allclose(ours.transform(x), theirs.transform(x), atol=1e-12)
        np.testing.assert_allclose(
            ours.inverse_transform(ours.transform(x)), x, atol=1e-9
        )

    def test_chunked_paths_match_unchunked(self, rng):
        """fit/transform stream in CHUNK_ROWS row chunks; shrinking the chunk
        so an array spans many chunks must not change the statistics or the
        transformed values (the full-archive splits take exactly this path)."""
        x = rng.normal(3.0, 2.5, size=(1000, 3)).astype(np.float32)
        big = StandardScaler().fit(x)
        small = StandardScaler()
        small.CHUNK_ROWS = 7  # instance override: 143 chunks
        small.fit(x)
        np.testing.assert_allclose(small.mean_, big.mean_, rtol=1e-13)
        np.testing.assert_allclose(small.scale_, big.scale_, rtol=1e-13)
        np.testing.assert_allclose(
            small.transform(x), big.transform(x), rtol=1e-13
        )

    def test_float32_dtype_fast_path(self, rng):
        """transform/inverse_transform(dtype=np.float32) must agree with the
        float64 default to float32 roundoff and return float32 without any
        full-size float64 temporary (the multi-GB archive path)."""
        x = rng.normal(50.0, 20.0, size=(5000, 2)).astype(np.float32)
        s = StandardScaler().fit(x)
        t32 = s.transform(x, dtype=np.float32)
        t64 = s.transform(x)
        assert t32.dtype == np.float32 and t64.dtype == np.float64
        np.testing.assert_allclose(t32, t64, rtol=2e-6, atol=2e-6)
        r32 = s.inverse_transform(t32, dtype=np.float32)
        assert r32.dtype == np.float32
        np.testing.assert_allclose(r32, x, rtol=2e-5, atol=2e-4)

    def test_save_load_roundtrip(self, rng, tmp_path):
        x = rng.normal(size=(50, 3))
        s = StandardScaler().fit(x)
        path = str(tmp_path / "scaler.npz")
        s.save(path)
        s2 = StandardScaler.load(path)
        np.testing.assert_array_equal(s.mean_, s2.mean_)
        np.testing.assert_array_equal(s.scale_, s2.scale_)


class TestHDF5Ingestion:
    def test_load_and_split(self, synthetic_hdf5_dir):
        splits = load_and_split_data(synthetic_hdf5_dir)
        # synthetic files are 2014/2015 -> all 120 steps land in train (<= 2021)
        assert len(splits["train"]["time"]) == 120
        assert len(splits["val"]["time"]) == 0
        assert len(splits["test"]["time"]) == 0
        assert splits["train"]["tec"].shape == (120, 5, 7)
        assert splits["train"]["space_weather_indices"].shape == (120, 5)
        # static coords copied into every split
        assert splits["val"]["latitude"].shape == (5,)

    def test_kp_scale_factor_applied(self, synthetic_hdf5_dir):
        from tec_mollm_tpu.data.hdf5_io import load_hdf5_file

        data = load_hdf5_file(synthetic_hdf5_dir[0])
        kp = data["space_weather_indices"][:, 3]
        # stored as ints scaled by 10 with scale_factor 0.1 -> restored values are
        # not integers in general but bounded like real Kp
        assert np.all(np.abs(kp) < 50)
        assert kp.dtype == np.float64

    def test_cadence_uniform_is_silent(self, caplog):
        from tec_mollm_tpu.data.hdf5_io import check_cadence

        t = np.datetime64("2020-01-01T00:00:00", "s") + np.arange(50) * np.timedelta64(
            7200, "s"
        )
        with caplog.at_level("WARNING"):
            assert check_cadence(t) == 0
        assert not caplog.records

    def test_cadence_gap_warns(self, caplog):
        from tec_mollm_tpu.data.hdf5_io import check_cadence

        t = np.datetime64("2020-01-01T00:00:00", "s") + np.arange(50) * np.timedelta64(
            7200, "s"
        )
        t[30:] += np.timedelta64(86400, "s")  # one-day outage
        with caplog.at_level("WARNING"):
            assert check_cadence(t, context="unit") == 1
        assert any("cadence gap" in r.getMessage() for r in caplog.records)

    def test_cadence_nonmonotonic_warns(self, caplog):
        from tec_mollm_tpu.data.hdf5_io import check_cadence

        a = np.datetime64("2021-01-01T00:00:00", "s") + np.arange(20) * np.timedelta64(
            7200, "s"
        )
        b = np.datetime64("2020-01-01T00:00:00", "s") + np.arange(20) * np.timedelta64(
            7200, "s"
        )
        t = np.concatenate([a, b])  # files out of order
        with caplog.at_level("WARNING"):
            assert check_cadence(t) >= 1
        assert any("non-increasing" in r.getMessage() for r in caplog.records)

    def test_build_split_tensors_warns_on_gapped_split(self, caplog):
        raw = synthetic_raw_data(num_steps=60, grid_h=3, grid_w=4)
        raw["time"] = raw["time"].copy()
        raw["time"][40:] += np.timedelta64(7200 * 5, "s")
        from tec_mollm_tpu.data.features import build_split_tensors

        with caplog.at_level("WARNING"):
            build_split_tensors({"train": raw}, horizon=3)
        assert any("cadence gap" in r.getMessage() for r in caplog.records)

    def test_split_boundaries(self):
        raw = synthetic_raw_data(num_steps=40, grid_h=3, grid_w=4, start="2021-12-29T00:00:00")
        from tec_mollm_tpu.data.hdf5_io import split_by_time

        splits = split_by_time(raw)
        t_train = splits["train"]["time"]
        t_val = splits["val"]["time"]
        assert t_train.max() <= np.datetime64("2021-12-31T23:59:59")
        assert t_val.min() >= np.datetime64("2022-01-01T00:00:00")
        assert len(t_train) + len(t_val) == 40


class TestFeatures:
    def test_feature_tensor_layout(self, rng):
        tec = rng.normal(size=(10, 4, 6)).astype(np.float32)
        idx = rng.normal(size=(10, 5)).astype(np.float32)
        x = construct_feature_tensor(tec, idx)
        assert x.shape == (10, 4, 6, 6)
        np.testing.assert_array_equal(x[..., 0], tec)
        # each index broadcast over the grid
        for k in range(5):
            np.testing.assert_array_equal(x[:, 2, 3, 1 + k], idx[:, k])

    def test_target_alignment_identity(self, rng):
        """Y[t, ..., i] == tec[t+i+1] — the reference's value-level invariant
        (feature_engineering.py:214)."""
        tec = rng.normal(size=(30, 3, 4)).astype(np.float32)
        y = construct_target_tensor(tec, horizon=12)
        assert y.shape == (18, 3, 4, 12)
        for t in (0, 5, 17):
            for i in (0, 5, 11):
                np.testing.assert_array_equal(y[t, ..., i], tec[t + i + 1])

    def test_time_features(self):
        times = np.array(
            [
                "2013-01-01T00:00:00",
                "2013-01-01T07:00:00",
                "2014-12-31T22:00:00",
                "2015-06-15T12:00:00",
                "2016-03-01T02:00:00",
                "2016-12-31T23:59:59",
            ],
            dtype="datetime64[s]",
        )
        tf = extract_time_features(times)
        assert tf.shape == (6, 4)
        assert tf.dtype == np.int32
        np.testing.assert_array_equal(tf[:, 0], [0, 3, 11, 6, 1, 11])  # hour//2
        assert tf[0, 1] == 0 and tf[2, 1] == 364  # doy-1
        np.testing.assert_array_equal(tf[:, 2], [0, 0, 1, 2, 3, 3])  # year index
        # season: Jan=0 (winter), Dec=0, Jun=2 (summer), Mar=1 (spring)
        np.testing.assert_array_equal(tf[:, 3], [0, 0, 0, 2, 1, 0])

    def test_year_index_consistent_across_splits(self):
        """Regression for the reference's per-split year indexing
        (feature_engineering.py:90-91): val 2022 must read year row 9 relative
        to a 2013 train start — NOT row 0, which holds 2013's content. The
        collision let the model recall train-year content on val/test data
        (measured collapse at 9-year archive scale, BASELINE.md round 3)."""
        def raw_for(start, steps=30):
            raw = synthetic_raw_data(num_steps=steps, grid_h=3, grid_w=4)
            raw = dict(raw)
            raw["time"] = np.datetime64(start, "s") + np.arange(steps) * np.timedelta64(
                7200, "s"
            )
            return raw

        splits = build_split_tensors(
            {
                "train": raw_for("2013-01-01T00:00:00"),
                "val": raw_for("2022-01-01T00:00:00"),
                "test": raw_for("2024-06-01T00:00:00"),
            },
            horizon=12,
        )
        assert set(np.unique(splits["train"]["time_features"][:, 2])) == {0}
        assert set(np.unique(splits["val"]["time_features"][:, 2])) == {9}
        assert set(np.unique(splits["test"]["time_features"][:, 2])) == {11}
        # isolated use (no base_year) keeps the reference's per-slice behavior
        tf = extract_time_features(raw_for("2022-01-01T00:00:00")["time"])
        assert set(np.unique(tf[:, 2])) == {0}

    def test_build_split_tensors_and_scaling(self):
        raw = synthetic_raw_data(num_steps=40, grid_h=3, grid_w=4)
        splits = build_split_tensors({"train": raw}, horizon=12)
        tr = splits["train"]
        assert tr["X"].shape == (28, 3, 4, 6)
        assert tr["Y"].shape == (28, 3, 4, 12)
        assert tr["time_features"].shape == (28, 4)

        std, scaler = standardize_features(splits)
        x = std["train"]["X"].reshape(-1, 6)
        np.testing.assert_allclose(x.mean(axis=0), 0.0, atol=1e-4)
        np.testing.assert_allclose(x.std(axis=0), 1.0, atol=1e-4)

        stdy, tscaler = standardize_targets(splits)
        y = stdy["train"]["Y"].reshape(-1)
        np.testing.assert_allclose(y.mean(), 0.0, atol=1e-4)
        # round trip back to physical units
        restored = tscaler.inverse_transform(stdy["train"]["Y"].reshape(-1, 1)).reshape(
            tr["Y"].shape
        )
        np.testing.assert_allclose(restored, tr["Y"], atol=1e-4)


class TestSlidingWindow:
    def _make(self, T=50, N=12, C=6, L_out=4):
        rng = np.random.default_rng(0)
        return {
            "X": rng.normal(size=(T, N, C)).astype(np.float32),
            "Y": rng.normal(size=(T, N, L_out)).astype(np.float32),
            "time_features": np.arange(T * 4, dtype=np.int32).reshape(T, 4),
        }

    def test_window_count_matches_reference_formula(self):
        data = self._make(T=50)
        ds = SlidingWindowDataset(data, L_in=16, L_out=4, stride=1)
        assert len(ds) == 50 - 16 - 4 + 1
        ds2 = SlidingWindowDataset(data, L_in=16, L_out=4, stride=12)
        assert len(ds2) == len(range(0, 50 - 16 - 4 + 1, 12))

    def test_tail_frac_keeps_chronological_tail(self):
        data = self._make(T=50)
        full = SlidingWindowDataset(data, L_in=16, L_out=4, stride=1)
        tail = SlidingWindowDataset(data, L_in=16, L_out=4, stride=1, tail_frac=0.25)
        keep = int(np.ceil(0.25 * len(full)))
        assert len(tail) == keep
        np.testing.assert_array_equal(
            tail.sample_indices, full.sample_indices[-keep:]
        )
        # the last window is identical in both views
        np.testing.assert_array_equal(tail[len(tail) - 1]["x"], full[len(full) - 1]["x"])

    def test_tail_frac_composes_with_stride_and_never_empties(self):
        data = self._make(T=50)
        strided = SlidingWindowDataset(data, L_in=16, L_out=4, stride=12)
        tiny = SlidingWindowDataset(
            data, L_in=16, L_out=4, stride=12, tail_frac=1e-6
        )
        assert len(tiny) == 1  # clamps to at least one window
        assert tiny.sample_indices[0] == strided.sample_indices[-1]

    def test_tail_frac_validates_range(self):
        data = self._make(T=50)
        for bad in (0.0, -0.5, 1.5):
            with pytest.raises(ValueError, match="tail_frac"):
                SlidingWindowDataset(data, L_in=16, L_out=4, tail_frac=bad)

    def test_item_contents(self):
        data = self._make(T=50)
        ds = SlidingWindowDataset(data, L_in=16, L_out=4, stride=3)
        item = ds[2]  # start = 6
        np.testing.assert_array_equal(item["x"], data["X"][6:22])
        np.testing.assert_array_equal(item["y"], data["Y"][6 + 16 - 1])
        np.testing.assert_array_equal(item["time_features"], data["time_features"][6:22])

    def test_gather_batch_matches_items(self):
        data = self._make(T=60)
        ds = SlidingWindowDataset(data, L_in=16, L_out=4, stride=2)
        batch = ds.gather_batch(np.array([0, 3, 7]))
        for b, idx in enumerate([0, 3, 7]):
            item = ds[idx]
            np.testing.assert_array_equal(batch["x"][b], item["x"])
            np.testing.assert_array_equal(batch["y"][b], item["y"])

    def test_loader_epochs_and_sharding(self):
        data = self._make(T=100)
        ds = SlidingWindowDataset(data, L_in=16, L_out=4, stride=1)
        loader = BatchLoader(ds, batch_size=8, shuffle=True, seed=1)
        loader.set_epoch(0)
        first = [b["x"][0, 0, 0, 0] for b in loader]
        loader.set_epoch(0)
        again = [b["x"][0, 0, 0, 0] for b in loader]
        assert first == again  # deterministic per epoch
        loader.set_epoch(1)
        shuffled = [b["x"][0, 0, 0, 0] for b in loader]
        assert first != shuffled

        # two shards partition the (truncated) index space
        l0 = BatchLoader(ds, batch_size=4, num_shards=2, shard_index=0, prefetch=0)
        l1 = BatchLoader(ds, batch_size=4, num_shards=2, shard_index=1, prefetch=0)
        n = len(ds) // 2 // 4
        assert len(l0) == len(l1) == n

        # strided sharding: the union of both shards' batch b equals the rows a
        # single process would put in global batch b (loss parity across
        # process counts, tests/test_multihost.py)
        lg = BatchLoader(ds, batch_size=8, num_shards=1, prefetch=0)
        for b0, b1, bg in zip(l0, l1, lg):
            union = np.sort(
                np.concatenate([b0["x"][:, 0, 0, 0], b1["x"][:, 0, 0, 0]])
            )
            np.testing.assert_array_equal(union, np.sort(bg["x"][:, 0, 0, 0]))

    def test_loader_pads_remainder(self):
        data = self._make(T=40)
        ds = SlidingWindowDataset(data, L_in=16, L_out=4, stride=1)  # 21 windows
        loader = BatchLoader(ds, batch_size=8, drop_remainder=False, prefetch=0)
        batches = list(loader)
        assert len(batches) == 3
        assert batches[-1]["x"].shape[0] == 8
        assert batches[-1]["valid"].sum() == 21 - 16

    def test_eval_sharding_drops_no_window(self):
        # 21 windows over 2 shards: 11 + 10. Eval sharding (drop_remainder=
        # False) must cover EVERY window exactly once across shards — the old
        # truncation to n//shards dropped the last n % shards windows on a
        # multi-host pod — while both shards still produce the same number of
        # identically-shaped batches (collective-safe dispatch).
        data = self._make(T=40)
        ds = SlidingWindowDataset(data, L_in=16, L_out=4, stride=1)  # 21 windows
        shards = [
            BatchLoader(
                ds, batch_size=4, drop_remainder=False,
                num_shards=2, shard_index=i, prefetch=0,
            )
            for i in range(2)
        ]
        assert len(shards[0]) == len(shards[1]) == 3  # ceil(ceil(21/2)/4)
        seen = []
        for ld in shards:
            batches = list(ld)
            assert len(batches) == 3
            for b in batches:
                assert b["x"].shape[0] == 4
                seen.extend(b["x"][b["valid"], 0, 0, 0].tolist())
        # window starts are distinct in x[:,0,0,0] for this fixture
        all_starts = np.sort(np.asarray(seen))
        expected = np.sort(
            np.concatenate(
                [b["x"][b["valid"], 0, 0, 0]
                 for b in BatchLoader(ds, batch_size=4, drop_remainder=False,
                                      prefetch=0)]
            )
        )
        assert len(all_starts) == 21
        np.testing.assert_array_equal(all_starts, expected)

    def test_eval_sharding_more_shards_than_windows(self):
        # 3 windows over 4 shards: the EMPTY shard must still dispatch the same
        # number of identically-shaped (fully masked) batches as its peers —
        # a shard that yields fewer steps deadlocks the others' collectives.
        data = self._make(T=22)
        ds = SlidingWindowDataset(data, L_in=16, L_out=4, stride=1)  # 3 windows
        shards = [
            BatchLoader(
                ds, batch_size=2, drop_remainder=False,
                num_shards=4, shard_index=i, prefetch=0,
            )
            for i in range(4)
        ]
        valid_counts = []
        for ld in shards:
            assert len(ld) == 1
            batches = list(ld)
            assert len(batches) == 1
            assert batches[0]["x"].shape[0] == 2
            valid_counts.append(int(batches[0]["valid"].sum()))
        assert sum(valid_counts) == 3       # every window scored exactly once
        assert valid_counts[3] == 0         # the empty shard is fully masked


class TestConfig:
    def test_derived_fields(self):
        from tec_mollm_tpu.config import Config

        cfg = Config().resolved()
        m = cfg.model
        assert m.spatial_in_channels == 22
        assert m.spatial_channels == 22
        assert m.conv_output_len == 12
        assert m.effective_patch_len == 4
        assert m.num_patches == 3
        assert m.head_input_dim == 2304

    def test_patch_len_auto_adjust(self):
        """reference train.py:255-260: patch_len 4 -> 2 -> 1."""
        from tec_mollm_tpu.config import Config, TrainConfig

        cfg = Config(train=TrainConfig(L_in=24)).resolved()  # conv len 6 -> patch 2
        assert cfg.model.effective_patch_len == 2
        assert cfg.model.num_patches == 3
        cfg = Config(train=TrainConfig(L_in=20)).resolved()  # conv len 5 -> patch 1
        assert cfg.model.effective_patch_len == 1
        assert cfg.model.num_patches == 5

    def test_json_roundtrip(self):
        from tec_mollm_tpu.config import Config

        cfg = Config().resolved()
        cfg2 = Config.from_json(cfg.to_json())
        assert cfg2 == cfg


class TestSanitizeRawTec:
    def test_nonfinite_values_replaced_and_logged(self, caplog):
        """NaN/inf in a raw archive must not reach the scaler fit (the
        reference only nan-guards at metric time, metrics.py:137-144)."""
        import logging

        from tec_mollm_tpu.data.preprocess import sanitize_raw_tec

        raw = synthetic_raw_data(num_steps=24, grid_h=4, grid_w=5, seed=0)
        raw["tec"][3, 1, 2] = np.nan
        raw["tec"][5, 0, 0] = np.inf
        raw["space_weather_indices"][7, 2] = -np.inf
        splits = {"train": raw}
        with caplog.at_level(logging.WARNING):
            sanitize_raw_tec(splits)
        assert np.isfinite(splits["train"]["tec"]).all()
        assert np.isfinite(splits["train"]["space_weather_indices"]).all()
        assert splits["train"]["tec"][3, 1, 2] == 0.0
        assert sum("non-finite" in r.message for r in caplog.records) == 2

    def test_clean_data_untouched(self):
        from tec_mollm_tpu.data.preprocess import sanitize_raw_tec

        raw = synthetic_raw_data(num_steps=24, grid_h=4, grid_w=5, seed=1)
        before = raw["tec"].copy()
        sanitize_raw_tec({"train": raw})
        np.testing.assert_array_equal(raw["tec"], before)


class TestSyntheticArchiveCapacity:
    """r3 scale-rehearsal regression: a 13-year-sized --synthetic archive used
    to anchor its train piece at 2021-01-01, so everything past 2021-12-31
    spilled over the split mask and was SILENTLY dropped (56.5k steps kept only
    4.4k train). The allocation is now capacity-aware over 2013-2025."""

    def test_13yr_sized_archive_fills_all_splits(self, tmp_path):
        from tec_mollm_tpu.config import DataConfig
        from tec_mollm_tpu.data.preprocess import run_preprocess

        sizes = run_preprocess(
            DataConfig(horizon=12), str(tmp_path / "p"),
            synthetic_steps=56500, synthetic_grid=(2, 2),
        )
        # ~9 years train / 2 years val / 2 years test at 2-h cadence
        assert sizes["train"] > 39000
        assert 8000 < sizes["val"] < 9000
        assert 8000 < sizes["test"] < 9000
        assert sum(sizes.values()) > 56500 - 3 * 12 - 10  # only horizon truncation

    def test_over_capacity_raises(self, tmp_path):
        from tec_mollm_tpu.config import DataConfig
        from tec_mollm_tpu.data.preprocess import run_preprocess

        with pytest.raises(ValueError, match="capacity"):
            run_preprocess(
                DataConfig(horizon=12), str(tmp_path / "q"),
                synthetic_steps=90000, synthetic_grid=(2, 2),
            )

    def test_small_archive_unchanged(self, tmp_path):
        from tec_mollm_tpu.config import DataConfig
        from tec_mollm_tpu.data.preprocess import run_preprocess

        sizes = run_preprocess(
            DataConfig(horizon=4), str(tmp_path / "r"),
            synthetic_steps=400, synthetic_grid=(3, 3),
        )
        assert sizes == {"train": 236, "val": 96, "test": 56}
