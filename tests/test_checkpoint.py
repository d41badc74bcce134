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

    def test_save_params_overwrites_atomically(self, tmp_path):
        """save_params goes through tmp+rename (code-review r3): re-saving must
        replace the old best in place, leave no .tmp behind (a stale one from
        a crashed save must also be swept), and the final dir must restore."""
        import os

        mgr = CheckpointManager(str(tmp_path), "run3b")
        params = {"w": jnp.arange(6.0).reshape(2, 3)}
        mgr.save_params(params, "best")
        # simulate a crashed earlier save leaving a stale tmp dir
        stale = os.path.join(mgr.dir, "best_params.tmp")
        os.makedirs(stale, exist_ok=True)
        mgr.save_params({"w": params["w"] * 2}, "best")
        assert not os.path.exists(stale)
        restored = mgr.restore_params({"w": jnp.zeros((2, 3))}, "best")
        np.testing.assert_array_equal(restored["w"], params["w"] * 2)

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

    def test_dangling_state_without_meta_is_no_checkpoint(self, tmp_path):
        """A crash between the two finalize renames must not brick --resume
        (ADVICE r1): state dir without meta.json == no checkpoint."""
        mgr = CheckpointManager(str(tmp_path), "run4")
        mgr.save_state(_state(1), {"epoch": 0, "best_val_loss": 1.0, "patience_counter": 0})
        assert mgr.has_checkpoint("latest")
        os.remove(os.path.join(mgr.dir, "latest.meta.json"))
        assert not mgr.has_checkpoint("latest")


class TestShardedCheckpoint:
    def test_tp2_sharded_state_roundtrip(self, tiny_graph, tmp_path):
        """A DP4xTP2-sharded train state round-trips through CheckpointManager
        with values intact and the template's shardings applied (VERDICT r1 next
        #7 — the collective-save contract, exercised single-process on the
        8-device mesh)."""
        import dataclasses

        from tec_mollm_tpu.config import tiny_config
        from tec_mollm_tpu.data.dataset import SlidingWindowDataset
        from tec_mollm_tpu.data.synthetic import synthetic_processed_split
        from tec_mollm_tpu.models import TECMoLLM
        from tec_mollm_tpu.parallel.mesh import make_mesh, replicated_sharding
        from tec_mollm_tpu.parallel.partitioning import param_shardings

        cfg = tiny_config()
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, model_parallel=2)
        )
        mesh = make_mesh(model_parallel=2)
        rep = replicated_sharding(mesh)
        split = synthetic_processed_split(
            num_windows=8, L_in=cfg.train.L_in, L_out=cfg.train.L_out,
            num_nodes=cfg.model.num_nodes, seed=0,
        )
        ds = SlidingWindowDataset(split, cfg.train.L_in, cfg.train.L_out)
        graph = (jnp.asarray(tiny_graph.neighbors), jnp.asarray(tiny_graph.neighbor_mask))
        batch = ds.gather_batch(np.arange(2))

        def sharded_state(seed):
            from tec_mollm_tpu.training.train_state import create_train_state

            state, _, _ = create_train_state(
                TECMoLLM(cfg.model), cfg, jax.random.key(seed), batch, graph
            )
            put = lambda tree: jax.device_put(
                tree, param_shardings(tree, mesh, 2, cfg.train.model_axis)
            )
            return state.replace(
                trainable=put(state.trainable),
                frozen=put(state.frozen),
                opt_state=jax.device_put(state.opt_state, rep),
                step=jax.device_put(state.step, rep),
                rng=jax.device_put(state.rng, rep),
            )

        saved = sharded_state(0)
        ca = saved.frozen["llm"]["h_0"]["attn"]["c_attn"]["kernel"]
        assert not ca.sharding.is_fully_replicated  # TP really applied

        mgr = CheckpointManager(str(tmp_path), "tp_run")
        mgr.save_state(saved, {"epoch": 0, "best_val_loss": 1.0, "patience_counter": 0})
        restored, meta = mgr.restore_state(sharded_state(1), "latest")

        np.testing.assert_array_equal(
            np.asarray(restored.frozen["llm"]["h_0"]["attn"]["c_attn"]["kernel"]),
            np.asarray(ca),
        )
        flat_s, _ = jax.tree_util.tree_flatten(saved.trainable)
        flat_r, _ = jax.tree_util.tree_flatten(restored.trainable)
        for a, b in zip(flat_s, flat_r):
            np.testing.assert_array_equal(np.asarray(b), np.asarray(a))
        # restored leaves carry the template's (sharded) layout
        rca = restored.frozen["llm"]["h_0"]["attn"]["c_attn"]["kernel"]
        if hasattr(rca, "sharding"):
            assert rca.sharding.is_equivalent_to(ca.sharding, ca.ndim)

class TestMixedRunWorkdir:
    """VERDICT r2 #7: a mixed-preset workdir silently evaluated whichever run
    finished last — run_name filtering + a config cross-check fix that."""

    def _two_runs(self, tmp_path):
        import time as _time

        root = tmp_path / "checkpoints"
        for name, age in [("flagship_run", 100), ("tiny_run", 0)]:
            p = root / name / "best_params"
            p.mkdir(parents=True)
            t = _time.time() - age
            os.utime(p, (t, t))
        return root

    def test_run_name_filter_overrides_mtime(self, tmp_path):
        root = self._two_runs(tmp_path)
        # unfiltered: mtime picks the newest run
        assert find_latest_checkpoint(str(root)).endswith("tiny_run/best_params")
        # filtered: the older run is selected explicitly
        got = find_latest_checkpoint(str(root), run_name="flagship_run")
        assert got.endswith("flagship_run/best_params")
        with pytest.raises(FileNotFoundError):
            find_latest_checkpoint(str(root), run_name="no_such_run")

    def test_config_mismatch_warns(self, tmp_path, caplog):
        import logging

        from tec_mollm_tpu.config import Config, tiny_config
        from tec_mollm_tpu.evaluation.harness import warn_on_config_mismatch

        root = self._two_runs(tmp_path)
        ckpt = str(root / "tiny_run" / "best_params")
        with open(root / "tiny_run" / "config.json", "w") as f:
            f.write(tiny_config().to_json())

        with caplog.at_level(logging.WARNING):
            # evaluating the tiny checkpoint with the flagship config: mismatch
            assert warn_on_config_mismatch(Config(), ckpt)
        assert any("disagrees" in r.message for r in caplog.records)

        caplog.clear()
        with caplog.at_level(logging.WARNING):
            assert not warn_on_config_mismatch(tiny_config(), ckpt)
        assert not caplog.records

    def test_no_config_json_is_silent(self, tmp_path):
        from tec_mollm_tpu.config import Config
        from tec_mollm_tpu.evaluation.harness import warn_on_config_mismatch

        root = self._two_runs(tmp_path)
        assert not warn_on_config_mismatch(
            Config(), str(root / "flagship_run" / "best_params")
        )

    def test_relative_checkpoint_resolves_against_workdir(self, tmp_path):
        """`--workdir W --checkpoint checkpoints/run/best_params` must work from
        any cwd: a relative path missing from cwd but present under the workdir
        resolves against the workdir (regression: the round-3 TPU queue ran all
        its eval steps from /tmp and every one 404'd)."""
        from tec_mollm_tpu.evaluation.harness import resolve_checkpoint

        root = self._two_runs(tmp_path)
        rel = os.path.join("checkpoints", "tiny_run", "best_params")
        got = resolve_checkpoint(rel, workdir=str(tmp_path))
        assert got == os.path.join(str(tmp_path), rel)
        # absolute and existing-relative paths are untouched
        assert resolve_checkpoint(got, workdir="/nonexistent") == got
