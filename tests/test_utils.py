"""Utility tests: run naming, step timer, trace no-op, hard_sync."""

import time

import jax.numpy as jnp
import pytest

from tec_mollm_tpu.utils.profiler import StepTimer, hard_sync, trace
from tec_mollm_tpu.utils.run_name import make_run_name


class TestRunName:
    def test_format(self):
        name = make_run_name(48, 12, 2, 1e-4, 3, timestamp="20260101-1200")
        assert name == "L48_S12_B2_LR0.0001_LLM3_20260101-1200"

    def test_timestamp_default(self):
        name = make_run_name(96, 3, 8, 5e-5, 6)
        assert name.startswith("L96_S3_B8_LR5e-05_LLM6_")
        assert len(name.split("_")[-1]) == len("YYYYmmdd-HHMM")


class TestProfiler:
    def test_step_timer(self):
        t = StepTimer()
        for _ in range(3):
            t.start()
            time.sleep(0.01)
            t.stop(items=4)
        assert t.steps == 3
        assert t.items == 12
        assert t.avg_step_ms >= 10
        assert t.items_per_sec > 0

    def test_trace_none_is_noop(self):
        with trace(None):
            pass

    def test_hard_sync_returns_sum(self):
        assert hard_sync(jnp.ones((3, 2))) == pytest.approx(6.0)
