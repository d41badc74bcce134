"""run_rollout_eval harness test: checkpoint on disk -> rollout metrics + CSV."""

import dataclasses
import os

import numpy as np
import pytest

import jax

from tec_mollm_tpu.config import tiny_config
from tec_mollm_tpu.data.dataset import SlidingWindowDataset
from tec_mollm_tpu.data.preprocess import run_preprocess
from tec_mollm_tpu.evaluation.harness import run_rollout_eval
from tec_mollm_tpu.graph.builder import GraphData
from tec_mollm_tpu.training.trainer import Trainer


@pytest.fixture(scope="module")
def trained_workdir(tmp_path_factory):
    wd = tmp_path_factory.mktemp("rollout_harness")
    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, epochs=1, accumulation_steps=1,
                                       batch_size=2)
    )
    data_dir = str(wd / "proc")
    run_preprocess(
        dataclasses.replace(cfg.data, horizon=cfg.train.L_out),
        data_dir, synthetic_steps=300,
        synthetic_grid=(cfg.model.grid_h, cfg.model.grid_w),
    )
    train_ds = SlidingWindowDataset.from_dir(data_dir, "train", cfg.train.L_in,
                                             cfg.train.L_out, stride=4)
    val_ds = SlidingWindowDataset.from_dir(data_dir, "val", cfg.train.L_in,
                                           cfg.train.L_out, stride=8)
    graph = GraphData.load(os.path.join(data_dir, "graph.npz"))
    from tec_mollm_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(data_parallel=1, model_parallel=1, devices=jax.devices()[:1])
    trainer = Trainer(cfg, train_ds, val_ds, graph, None, workdir=str(wd),
                      run_name="rh", mesh=mesh)
    trainer.fit()
    return wd, cfg, data_dir


class TestRolloutHarness:
    def test_rollout_eval_outputs(self, trained_workdir):
        wd, cfg, data_dir = trained_workdir
        out = run_rollout_eval(
            cfg, data_dir,
            checkpoint=str(wd / "checkpoints" / "rh" / "best_params"),
            rollout_steps=2 * cfg.train.L_out,
            num_windows=3,
            output_dir=str(wd / "results"),
            workdir=str(wd),
        )
        assert out["rollout_steps"] == 2 * cfg.train.L_out
        assert len(out["mae_by_step"]) == 2 * cfg.train.L_out
        assert np.isfinite(out["mae_avg"]) and out["mae_avg"] > 0
        csv = (wd / "results" / "rollout_results.csv").read_text().splitlines()
        assert csv[0] == "step,mae,rmse"
        assert len(csv) == 1 + 2 * cfg.train.L_out

    def test_latest_resolution(self, trained_workdir):
        wd, cfg, data_dir = trained_workdir
        out = run_rollout_eval(
            cfg, data_dir, checkpoint="latest",
            rollout_steps=cfg.train.L_out, num_windows=2,
            output_dir=str(wd / "results2"), workdir=str(wd),
        )
        assert np.isfinite(out["rmse_avg"])

    def test_too_long_rollout_raises(self, trained_workdir):
        wd, cfg, data_dir = trained_workdir
        with pytest.raises(ValueError, match="too short"):
            run_rollout_eval(
                cfg, data_dir, checkpoint="latest", rollout_steps=10_000,
                output_dir=str(wd / "r3"), workdir=str(wd),
            )


class TestPredict:
    def test_forecast_default_window(self, trained_workdir):
        """Default: most recent test window -> physical-unit (clipped) forecast."""
        from tec_mollm_tpu.evaluation.harness import run_prediction

        wd, cfg, data_dir = trained_workdir
        out = run_prediction(
            cfg, data_dir, checkpoint="latest",
            output_dir=str(wd / "fc"), workdir=str(wd),
        )
        n = cfg.model.grid_h * cfg.model.grid_w
        assert out["forecast"].shape == (1, cfg.train.L_out, n)
        assert np.isfinite(out["forecast"]).all()
        assert (out["forecast"] >= 0.0).all() and (out["forecast"] <= 200.0).all()
        with np.load(out["path"]) as d:
            np.testing.assert_array_equal(d["forecast"], out["forecast"])
            assert d["truth"].shape == out["forecast"].shape

    def test_forecast_explicit_indices_and_bounds(self, trained_workdir):
        from tec_mollm_tpu.evaluation.harness import run_prediction

        wd, cfg, data_dir = trained_workdir
        out = run_prediction(
            cfg, data_dir, checkpoint="latest", split="val", indices=[0, 1],
            output_dir=str(wd / "fc2"), workdir=str(wd),
        )
        assert out["forecast"].shape[0] == 2 and out["indices"] == [0, 1]
        with pytest.raises(ValueError, match="out of range"):
            run_prediction(
                cfg, data_dir, checkpoint="latest", indices=[10_000_000],
                output_dir=str(wd / "fc3"), workdir=str(wd),
            )
