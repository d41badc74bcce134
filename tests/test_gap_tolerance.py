"""Gap-tolerant ingestion: cadence_policy = warn | raise | segment.

Real CRIM archives have outages; the reference assumes continuity and silently
builds windows spanning gaps (/root/reference/src/data/data_loader.py:84-130,
dataset.py:46-53). Here gaps become a policy: 'segment' drops exactly the
windows whose raw span crosses a discontinuity or a mostly-NaN timestep, for
both the host pipeline (SlidingWindowDataset) and the device-resident path
(DeviceResidentDataset).
"""

from __future__ import annotations

import subprocess
import sys

import numpy as np
import pytest

from tec_mollm_tpu.data.dataset import SlidingWindowDataset
from tec_mollm_tpu.data.features import build_split_tensors
from tec_mollm_tpu.data.hdf5_io import compute_segments, valid_window_starts


def _times(n, start="2013-01-01T00:00:00"):
    return np.datetime64(start, "s") + np.arange(n) * np.timedelta64(7200, "s")


class TestComputeSegments:
    def test_uniform_is_one_segment(self):
        seg = compute_segments(_times(50))
        assert (seg == 0).all()

    def test_gap_starts_new_segment(self):
        t = _times(20)
        t = np.concatenate([t[:8], t[12:]])  # 4-step outage after index 7
        seg = compute_segments(t)
        assert (seg[:8] == 0).all() and (seg[8:] == 1).all()

    def test_non_monotonic_breaks(self):
        t = np.concatenate([_times(10), _times(10)])  # restart: out of order
        seg = compute_segments(t)
        assert seg[9] == 0 and seg[10] == 1

    def test_bad_steps_isolated(self):
        t = _times(10)
        bad = np.zeros(10, bool)
        bad[4] = True
        seg = compute_segments(t, bad_steps=bad)
        assert seg[4] == -1
        assert (seg[:4] == seg[0]).all()
        assert (seg[5:] == seg[5]).all()
        assert seg[0] != seg[5]  # the bad step breaks its neighbors apart


class TestValidWindowStarts:
    def test_drops_exactly_the_spanning_windows(self):
        # segments: [0..99] and [100..354]; window span L_in+L_out = 60
        seg = np.concatenate([np.zeros(100, np.int32), np.ones(255, np.int32)])
        starts = np.arange(0, 284)
        kept = valid_window_starts(starts, seg, L_in=48, L_out=12)
        expect = np.concatenate([np.arange(0, 41), np.arange(100, 284)])
        np.testing.assert_array_equal(kept, expect)

    def test_raises_if_segment_too_short(self):
        with pytest.raises(ValueError):
            valid_window_starts(np.array([0]), np.zeros(10, np.int32), 48, 12)


class TestPolicyInBuildSplitTensors:
    def _gapped_split(self):
        n = 80
        t = _times(n)
        t = np.concatenate([t[:30], t[34:]])  # outage
        rng = np.random.default_rng(0)
        return {
            "train": {
                "tec": rng.random((76, 4, 5)).astype(np.float32) * 20,
                "time": t,
                "space_weather_indices": rng.random((76, 5)).astype(np.float32),
            }
        }

    def test_raise_policy_aborts(self):
        with pytest.raises(ValueError, match="irregularities"):
            build_split_tensors(self._gapped_split(), horizon=4,
                                cadence_policy="raise")

    def test_segment_policy_attaches_ids(self):
        out = build_split_tensors(self._gapped_split(), horizon=4,
                                  cadence_policy="segment")
        seg = out["train"]["segment_id"]
        assert seg.shape == (76,)  # RAW length, not truncated
        assert seg[29] == 0 and seg[30] == 1
        # X/tf truncated as always; dataset filter reaches into the raw tail
        assert out["train"]["X"].shape[0] == 72

    def test_warn_policy_has_no_ids(self):
        out = build_split_tensors(self._gapped_split(), horizon=4)
        assert "segment_id" not in out["train"]

    def test_unknown_policy_rejected(self):
        with pytest.raises(ValueError, match="cadence_policy"):
            build_split_tensors(self._gapped_split(), horizon=4,
                                cadence_policy="ignore")


class TestEndToEndGappedArchive:
    @pytest.fixture(scope="class")
    def gapped_dir(self, tmp_path_factory):
        out = tmp_path_factory.mktemp("gapped")
        cmd = [
            sys.executable, "-m", "tec_mollm_tpu.data.preprocess",
            "--synthetic", "600", "--synthetic-grid", "6", "6",
            "--synthetic-drop", "100", "5",
            "--cadence-policy", "segment",
            "--out", str(out),
        ]
        subprocess.run(cmd, check=True, capture_output=True,
                       env={"PALLAS_AXON_POOL_IPS": "", "PATH": "/usr/bin:/bin",
                            "PYTHONPATH": "/root/repo"})
        return str(out)

    def test_window_counts_exact(self, gapped_dir):
        # 600 steps -> train 360 (archive indices 0..359), drop [100,105):
        # train raw T = 355; gap between positions 99 and 100.
        ds = SlidingWindowDataset.from_dir(gapped_dir, "train", L_in=48, L_out=12)
        # len(X) = 355-12 = 343; unfiltered starts 0..283;
        # seg0 ends at 99 -> i <= 40 (41); seg1 needs i >= 100 -> 184
        assert len(ds) == 41 + 184
        # every surviving window's span stays inside one segment
        with np.load(f"{gapped_dir}/train_set.npz") as d:
            seg = d["segment_id"]
        for i in ds.sample_indices:
            assert seg[i] == seg[i + 48 + 12 - 1] >= 0

    def test_device_resident_matches_host_filter(self, gapped_dir):
        pytest.importorskip("jax")
        from tec_mollm_tpu.data.device_data import DeviceResidentDataset

        host = SlidingWindowDataset.from_dir(gapped_dir, "train", L_in=48, L_out=12)
        dev = DeviceResidentDataset(gapped_dir, "train", L_in=48, L_out=12)
        np.testing.assert_array_equal(host.sample_indices, dev.sample_indices)

    def test_val_test_unaffected(self, gapped_dir):
        # the outage is inside train; val/test are single segments
        for mode, t_raw in (("val", 150), ("test", 90)):
            ds = SlidingWindowDataset.from_dir(gapped_dir, mode, L_in=48, L_out=12)
            assert len(ds) == (t_raw - 12) - 48 - 12 + 1


class TestBadStepFlagging:
    def test_nan_block_becomes_untouchable(self):
        from tec_mollm_tpu.data.preprocess import sanitize_raw_tec

        rng = np.random.default_rng(1)
        tec = rng.random((40, 4, 5)).astype(np.float32) * 20
        tec[17] = np.nan  # a fully-dropped map
        splits = {"train": {
            "tec": tec,
            "time": _times(40),
            "space_weather_indices": rng.random((40, 5)).astype(np.float32),
        }}
        sanitize_raw_tec(splits)
        assert splits["train"]["bad_steps"][17]
        assert np.isfinite(splits["train"]["tec"]).all()

        out = build_split_tensors(splits, horizon=4, cadence_policy="segment")
        seg = out["train"]["segment_id"]
        assert seg[17] == -1
        starts = np.arange(0, (40 - 4) - 8 - 4 + 1)
        kept = valid_window_starts(starts, seg, L_in=8, L_out=4)
        # no surviving window's 12-step span may contain raw index 17
        for i in kept:
            assert not (i <= 17 <= i + 11)
        # windows clear of the bad step DO survive on both sides
        assert 0 in kept and 18 in kept
