"""Checkpoint manager unit tests: state round trip, best-params, latest resolution."""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tec_mollm_tpu.training.checkpoint import CheckpointManager, find_latest_checkpoint
from tec_mollm_tpu.training.train_state import TrainState


def _state(seed=0):
    rng = np.random.default_rng(seed)
    return TrainState(
        step=jnp.asarray(7, jnp.int32),
        trainable={"a": jnp.asarray(rng.normal(size=(4, 3)).astype(np.float32)),
                   "frozen_here": None},
        frozen={"a": None,
                "frozen_here": jnp.asarray(rng.normal(size=(2,)).astype(np.float32))},
        opt_state={"mu": {"a": jnp.zeros((4, 3))}},
        rng=jax.random.key(seed),
    )


class TestCheckpointManager:
    def test_state_roundtrip_with_partition(self, tmp_path):
        mgr = CheckpointManager(str(tmp_path), "run1")
        state = _state(1)
        mgr.save_state(state, {"epoch": 3, "best_val_loss": 0.5, "patience_counter": 2})
        restored, meta = mgr.restore_state(_state(99), "latest")
        np.testing.assert_array_equal(restored.trainable["a"], state.trainable["a"])
        np.testing.assert_array_equal(
            restored.frozen["frozen_here"], state.frozen["frozen_here"]
        )
        assert int(restored.step) == 7
        assert meta["epoch"] == 3
        # rng keys restore to the same stream
        np.testing.assert_array_equal(
            jax.random.key_data(restored.rng), jax.random.key_data(state.rng)
        )

    def test_save_state_overwrites_atomically(self, tmp_path):
        mgr = CheckpointManager(str(tmp_path), "run2")
        mgr.save_state(_state(1), {"epoch": 0, "best_val_loss": 1.0, "patience_counter": 0})
        mgr.save_state(_state(2), {"epoch": 1, "best_val_loss": 0.9, "patience_counter": 0})
        restored, meta = mgr.restore_state(_state(0), "latest")
        assert meta["epoch"] == 1
        np.testing.assert_array_equal(restored.trainable["a"], _state(2).trainable["a"])

    def test_params_roundtrip(self, tmp_path):
        mgr = CheckpointManager(str(tmp_path), "run3")
        params = {"w": jnp.arange(6.0).reshape(2, 3), "b": jnp.ones((3,))}
        mgr.save_params(params, "best")
        restored = mgr.restore_params(jax.tree.map(jnp.zeros_like, params), "best")
        np.testing.assert_array_equal(restored["w"], params["w"])

    def test_find_latest_by_mtime(self, tmp_path):
        """'latest' resolves to the most recent run's best_params
        (reference test.py:73-89 semantics)."""
        root = tmp_path / "checkpoints"
        for name, age in [("old_run", 100), ("new_run", 0)]:
            p = root / name / "best_params"
            p.mkdir(parents=True)
            t = time.time() - age
            os.utime(p, (t, t))
        assert find_latest_checkpoint(str(root)).endswith("new_run/best_params")

    def test_find_latest_missing_raises(self, tmp_path):
        (tmp_path / "checkpoints").mkdir()
        with pytest.raises(FileNotFoundError):
            find_latest_checkpoint(str(tmp_path / "checkpoints"))
