"""CLI integration tests: preprocess -> train -> test via subprocess, tiny config.

The CLIs are the user surface of the framework (reference: scripts/preprocess.py,
torchrun train.py, python test.py); these tests run them exactly as a user would."""

import dataclasses
import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(args, cwd, timeout=600):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    env["JAX_PLATFORMS"] = "cpu"  # harmless if sitecustomize already decided
    # keep CLI test subprocesses off the TPU tunnel entirely: the axon plugin
    # registers an exclusive device session from sitecustomize even for CPU runs
    env["PALLAS_AXON_POOL_IPS"] = ""
    proc = subprocess.run(
        [sys.executable] + args,
        cwd=cwd,
        env=env,
        capture_output=True,
        text=True,
        timeout=timeout,
    )
    assert proc.returncode == 0, f"CLI failed:\n{proc.stdout}\n{proc.stderr}"
    return proc


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    from tec_mollm_tpu.config import tiny_config

    wd = tmp_path_factory.mktemp("cli")
    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, epochs=1, patience=2)
    )
    (wd / "config.json").write_text(cfg.to_json())
    return wd, cfg


class TestCLIPipeline:
    def test_preprocess_synthetic(self, workdir):
        wd, cfg = workdir
        run_cli(
            [
                "-m", "tec_mollm_tpu.data.preprocess",
                "--synthetic", "300", "--synthetic-grid", "6", "8",
                "--horizon", str(cfg.train.L_out), "--out", "proc",
            ],
            cwd=str(wd),
        )
        for f in ("train_set.npz", "val_set.npz", "test_set.npz",
                  "scaler.npz", "target_scaler.npz", "graph.npz",
                  "preprocess_meta.json"):
            assert (wd / "proc" / f).exists(), f
        meta = json.loads((wd / "proc" / "preprocess_meta.json").read_text())
        assert meta["grid"] == [6, 8]

    def test_train(self, workdir):
        wd, cfg = workdir
        proc = run_cli(
            [
                os.path.join(REPO, "train.py"),
                "--config", "config.json", "--data-dir", "proc",
                "--workdir", ".", "--run-name", "clitest", "--cpu",
            ],
            cwd=str(wd),
        )
        assert (wd / "checkpoints" / "clitest" / "best_params").exists()
        assert (wd / "checkpoints" / "clitest" / "latest").exists()
        assert (wd / "checkpoints" / "clitest" / "config.json").exists()
        assert (wd / "logs" / "clitest.jsonl").exists()
        history = [
            json.loads(line)
            for line in (wd / "logs" / "clitest.jsonl").read_text().splitlines()
        ]
        assert history[0]["epoch"] == 0
        assert "val_loss" in history[0]

    def test_evaluate(self, workdir):
        wd, cfg = workdir
        proc = run_cli(
            [
                os.path.join(REPO, "test.py"),
                "--config", "config.json", "--data-dir", "proc",
                "--workdir", ".", "--checkpoint", "latest",
                "--output-dir", "results", "--cpu",
            ],
            cwd=str(wd),
        )
        assert (wd / "results" / "evaluation_results.csv").exists()
        summary = (wd / "results" / "evaluation_summary.txt").read_text()
        assert "TEC-MoLLM" in summary
        assert "HistoricalAverage" in summary
        assert "Improvement" in summary
        csv = (wd / "results" / "evaluation_results.csv").read_text().splitlines()
        assert len(csv) == 3  # header + 2 models

    def test_evaluate_val_tail(self, workdir):
        """--split val --tail-frac: the shift-aware model-selection probe
        scores only the chronological tail of the validation split."""
        wd, cfg = workdir
        proc = run_cli(
            [
                os.path.join(REPO, "test.py"),
                "--config", "config.json", "--data-dir", "proc",
                "--workdir", ".", "--checkpoint", "latest",
                "--split", "val", "--tail-frac", "0.5",
                "--output-dir", "results_valtail", "--cpu",
            ],
            cwd=str(wd),
        )
        out = proc.stdout + proc.stderr
        assert "val windows (tail 0.5" in out
        summary = (wd / "results_valtail" / "evaluation_summary.txt").read_text()
        assert "TEC-MoLLM" in summary

    def test_predict(self, workdir):
        """Forecast CLI: checkpoint -> physical-unit forecast npz."""
        wd, cfg = workdir
        run_cli(
            [
                os.path.join(REPO, "predict.py"),
                "--config", "config.json", "--data-dir", "proc",
                "--workdir", ".", "--checkpoint", "latest",
                "--indices", "0", "2",
                "--output-dir", "results", "--cpu",
            ],
            cwd=str(wd),
        )
        import numpy as np

        with np.load(wd / "results" / "forecast.npz") as d:
            n = cfg.model.grid_h * cfg.model.grid_w
            assert d["forecast"].shape == (2, cfg.train.L_out, n)
            assert np.isfinite(d["forecast"]).all()
            assert d["forecast"].min() >= 0.0 and d["forecast"].max() <= 200.0
            assert list(d["indices"]) == [0, 2]

    def test_predict_latest_without_config_flag(self, workdir):
        """With --checkpoint latest and NO --config, the config.json written
        next to the RESOLVED checkpoint must be used (review finding: the old
        lookup skipped it exactly in the 'latest' case and assumed the
        flagship config, which crashes on tiny checkpoints)."""
        wd, cfg = workdir
        run_cli(
            [
                os.path.join(REPO, "predict.py"),
                "--data-dir", "proc", "--workdir", ".",
                "--checkpoint", "latest",
                "--output-dir", "results_lat", "--cpu",
            ],
            cwd=str(wd),
        )
        import numpy as np

        with np.load(wd / "results_lat" / "forecast.npz") as d:
            n = cfg.model.grid_h * cfg.model.grid_w
            assert d["forecast"].shape == (1, cfg.train.L_out, n)

    def test_failed_resume_preserves_config_record(self, workdir):
        """A resume launched with the WRONG flags must fail without clobbering
        the existing checkpoint's config.json (review finding: the pre-training
        config write used to run before the restore proved compatibility, so a
        crashed wrong-flag resume left an unloadable config next to a still-
        valid checkpoint)."""
        wd, cfg = workdir
        config_path = wd / "checkpoints" / "clitest" / "config.json"
        original = config_path.read_text()
        env = dict(os.environ)
        env["PYTHONPATH"] = REPO
        env["JAX_PLATFORMS"] = "cpu"
        env["PALLAS_AXON_POOL_IPS"] = ""
        proc = subprocess.run(
            [
                sys.executable, os.path.join(REPO, "train.py"),
                "--config", "config.json", "--llm-layers", "1",  # ckpt has 2
                "--data-dir", "proc", "--workdir", ".",
                "--run-name", "clitest", "--resume", "--cpu",
            ],
            cwd=str(wd), env=env, capture_output=True, text=True, timeout=600,
        )
        assert proc.returncode != 0, "wrong-flag resume unexpectedly succeeded"
        assert "config" in (proc.stderr + proc.stdout).lower()
        assert config_path.read_text() == original

    def test_preprocess_from_hdf5_files(self, tmp_path):
        """The real-data path: CRIM-layout HDF5 files -> processed npz splits."""
        from tec_mollm_tpu.data.synthetic import write_synthetic_hdf5

        raw = tmp_path / "data" / "raw"
        raw.mkdir(parents=True)
        for year in (2021, 2022, 2024):
            write_synthetic_hdf5(
                str(raw / f"CRIM_SW2hr_AI_v1.2_{year}_DataDrivenRange_CN.hdf5"),
                year=year, num_steps=40, grid_h=5, grid_w=7,
            )
        run_cli(
            [
                "-m", "tec_mollm_tpu.data.preprocess",
                "--raw-dir", "data/raw", "--horizon", "4", "--out", "proc",
            ],
            cwd=str(tmp_path),
        )
        import numpy as np

        with np.load(tmp_path / "proc" / "train_set.npz") as d:
            assert d["X"].shape == (40 - 4, 35, 6)  # 40 steps - horizon, flattened
        meta = json.loads((tmp_path / "proc" / "preprocess_meta.json").read_text())
        assert meta["synthetic"] is False
        assert meta["grid"] == [5, 7]

    def test_bench_quick(self, workdir):
        wd, _ = workdir
        proc = run_cli(
            [os.path.join(REPO, "bench.py"), "--quick", "--cpu"], cwd=str(wd)
        )
        line = proc.stdout.strip().splitlines()[-1]
        rec = json.loads(line)
        assert rec["metric"] == "train_windows_per_sec_per_chip"
        assert rec["value"] > 0
        assert "vs_baseline" in rec


class TestConfigResolution:
    """--config accepts preset names as well as json paths (round 3)."""

    def test_load_config_preset_and_path(self, tmp_path):
        from tec_mollm_tpu.config import PRESETS, load_config

        cfg = load_config("long_horizon")
        assert cfg.train.L_in == 96 and cfg.data.horizon == 24
        p = tmp_path / "c.json"
        p.write_text(PRESETS["default"]().to_json())
        assert load_config(str(p)).train.L_in == 48
        with pytest.raises(FileNotFoundError):
            load_config("not_a_preset_or_file")

    def test_train_build_config_overrides(self, monkeypatch, tmp_path):
        sys.path.insert(0, REPO)
        import train as train_cli

        monkeypatch.setattr(
            sys, "argv",
            ["train.py", "--config", "scale_up", "--val-stride", "4", "--remat"],
        )
        cfg = train_cli.build_config(train_cli.parse_args())
        assert cfg.train.L_in == 336
        assert cfg.train.val_stride == 4
        # override wins over preset policy (scale_up ships remat OFF since r3)
        assert cfg.train.remat_llm is True

        monkeypatch.setattr(sys, "argv", ["train.py", "--val-stride", "6"])
        cfg = train_cli.build_config(train_cli.parse_args())
        assert cfg.train.val_stride == 6
