"""Mid-epoch checkpoint/resume (beyond reference).

At archive scale one epoch is tens of minutes (BASELINE.md 13-year rows);
epoch-boundary-only checkpointing loses all of it to a signal or a hard
failure. These tests pin the contract: the epoch's batch order is a pure
function of seed+epoch, so a run interrupted after k macro steps and resumed
from its checkpoint must produce bit-for-bit the parameters of a run that was
never interrupted.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tec_mollm_tpu.config import tiny_config
from tec_mollm_tpu.data.dataset import BatchLoader, SlidingWindowDataset
from tec_mollm_tpu.data.synthetic import synthetic_processed_split
from tec_mollm_tpu.parallel.mesh import make_mesh


def _cfg(**train_over):
    cfg = tiny_config()
    return dataclasses.replace(
        cfg,
        train=dataclasses.replace(
            cfg.train, epochs=1, batch_size=2, accumulation_steps=2,
            model_parallel=1, **train_over,
        ),
    ).resolved()


@pytest.fixture(scope="module")
def split():
    cfg = _cfg()
    return synthetic_processed_split(
        num_windows=30, L_in=cfg.train.L_in, L_out=cfg.train.L_out,
        num_nodes=cfg.model.num_nodes, seed=3,
    )


def _trainer(cfg, split, graph, workdir, run_name="mid"):
    from tec_mollm_tpu.training.trainer import Trainer

    ds = SlidingWindowDataset(split, cfg.train.L_in, cfg.train.L_out, stride=1)
    mesh = make_mesh(data_parallel=1, model_parallel=1, devices=jax.devices()[:1])
    return Trainer(
        cfg, ds, None, graph, target_scaler=None,
        workdir=str(workdir), run_name=run_name, mesh=mesh,
    )


class _StopAfter(dict):
    """stop_requested stand-in: reads of 'flag' turn True after n checks —
    deterministic signal timing without real signals."""

    def __init__(self, n):
        super().__init__(flag=False)
        self.n = n
        self.reads = 0

    def __getitem__(self, key):
        if key == "flag":
            self.reads += 1
            return self.reads >= self.n
        return super().__getitem__(key)


class TestIterFrom:
    def test_skips_exactly_k_batches(self, split):
        cfg = _cfg()
        ds = SlidingWindowDataset(split, cfg.train.L_in, cfg.train.L_out, stride=1)
        loader = BatchLoader(ds, batch_size=4, shuffle=True, seed=7)
        loader.set_epoch(2)
        full = list(loader)
        tail = list(loader.iter_from(3))
        assert len(tail) == len(full) - 3
        for a, b in zip(full[3:], tail):
            np.testing.assert_array_equal(a["x"], b["x"])
            np.testing.assert_array_equal(a["y"], b["y"])

    def test_from_zero_is_identity(self, split):
        cfg = _cfg()
        ds = SlidingWindowDataset(split, cfg.train.L_in, cfg.train.L_out, stride=1)
        loader = BatchLoader(ds, batch_size=4, shuffle=False, drop_remainder=False)
        full = list(loader)
        again = list(loader.iter_from(0))
        assert len(full) == len(again)

    def test_past_end_yields_nothing(self, split):
        cfg = _cfg()
        ds = SlidingWindowDataset(split, cfg.train.L_in, cfg.train.L_out, stride=1)
        loader = BatchLoader(ds, batch_size=4, shuffle=False, drop_remainder=False)
        assert list(loader.iter_from(len(loader) + 1)) == []


class TestMidEpochResume:
    def _final_trainable(self, trainer):
        return jax.tree.map(np.asarray, trainer.state.trainable)

    def test_signal_interrupt_then_resume_matches_uninterrupted(
        self, split, tiny_graph, tmp_path
    ):
        cfg = _cfg()
        # Run A: the uninterrupted reference epoch — 30 windows at macro B=4
        # = 7 full steps + 1 padded, loss-masked remainder step (every window
        # trains; reference trailing-flush semantics, train.py:117-126)
        a = _trainer(cfg, split, tiny_graph, tmp_path / "a")
        stats_a = a.train_epoch()
        assert stats_a["steps_in_epoch"] == 8 and not stats_a["interrupted"]
        want = self._final_trainable(a)

        # Run B: interrupted after 3 steps, checkpointed mid-epoch
        b = _trainer(cfg, split, tiny_graph, tmp_path / "b")
        stats_b = b.train_epoch(0, _StopAfter(3))
        assert stats_b["interrupted"] and stats_b["steps_in_epoch"] == 3
        b._save_latest(step_in_epoch=3)

        # Run C: a FRESH process-equivalent resumes and completes the epoch
        c = _trainer(cfg, split, tiny_graph, tmp_path / "b")
        history = c.fit(resume=True)
        got = self._final_trainable(c)
        jax.tree.map(
            lambda x, y: np.testing.assert_allclose(x, y, rtol=0, atol=0),
            want, got,
        )
        # the resumed epoch trained only the remaining 5 steps (incl. the
        # padded remainder step)
        assert history[-1]["updates"] == 5
        assert history[-1]["steps_in_epoch"] == 8

    def test_periodic_step_checkpoint_survives_hard_crash(
        self, split, tiny_graph, tmp_path
    ):
        """checkpoint_every_steps: no signal ever arrives (SIGKILL / tunnel
        death) — the last periodic save must still resume correctly."""
        cfg = _cfg(checkpoint_every_steps=2)
        a = _trainer(cfg, split, tiny_graph, tmp_path / "a")
        a.train_epoch()
        want = self._final_trainable(a)

        # crash after 5 steps: periodic saves at 2 and 4; steps 5's work is lost
        b = _trainer(cfg, split, tiny_graph, tmp_path / "b")
        b.train_epoch(0, _StopAfter(5))  # stand-in for the crash point
        # NO explicit save — simulate SIGKILL right after step 5

        c = _trainer(cfg, split, tiny_graph, tmp_path / "b")
        assert c.ckpt.has_checkpoint("latest")
        history = c.fit(resume=True)
        got = self._final_trainable(c)
        jax.tree.map(
            lambda x, y: np.testing.assert_allclose(x, y, rtol=0, atol=0),
            want, got,
        )
        # resumed from step 4 (the last periodic save), retrained 5..8
        assert history[-1]["updates"] == 4

    def test_changed_batch_geometry_refused(self, split, tiny_graph, tmp_path):
        """A mid-epoch position counts macro steps of a specific batch
        geometry; resuming with a different one would silently skip or
        double-train windows — it must refuse loudly instead."""
        cfg = _cfg()
        a = _trainer(cfg, split, tiny_graph, tmp_path / "a")
        a.train_epoch(0, _StopAfter(3))
        a._save_latest(step_in_epoch=3)

        def _with(**over):
            return dataclasses.replace(
                cfg, train=dataclasses.replace(cfg.train, **over)
            ).resolved()

        for field, value in (
            ("batch_size", 4), ("accumulation_steps", 1),
            ("train_stride", 2), ("seed", 9),
        ):
            b = _trainer(_with(**{field: value}), split, tiny_graph, tmp_path / "a")
            with pytest.raises(RuntimeError, match="batch geometry.*" + field):
                b.fit(resume=True)

        # epoch-BOUNDARY checkpoints stay geometry-independent: the same
        # changed config resumes fine from a step_in_epoch=0 save
        a._save_latest(step_in_epoch=0)
        c = _trainer(
            _with(batch_size=4, epochs=2), split, tiny_graph, tmp_path / "a"
        )
        c.fit(resume=True)

    def test_boundary_save_still_resumes_next_epoch(
        self, split, tiny_graph, tmp_path
    ):
        """Regression: step_in_epoch=0 keeps the historical epoch+1 semantics."""
        cfg = _cfg()
        a = _trainer(cfg, split, tiny_graph, tmp_path / "a")
        a.fit()  # 1 epoch, boundary save
        cfg3 = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, epochs=2)
        )
        b = _trainer(cfg3, split, tiny_graph, tmp_path / "a")
        history = b.fit(resume=True)
        assert [h["epoch"] for h in history] == [1]
