"""Evaluation harness: trained model vs Historical-Average baseline on the test split.

Behavioral contract (reference /root/reference/test.py):
  * test dataset stride 1 (test.py:129-135);
  * checkpoint resolution including "latest" by mtime (test.py:73-89, :167-172);
  * model inference with the same reshapes as validation (test.py:19-44);
  * window-mean HA baseline (test.py:46-71);
  * evaluate_horizons for both, improvement % per metric (test.py:243-256);
  * results CSV + text summary (test.py:260-278).
"""

from __future__ import annotations

import logging
import os
from typing import Any

import numpy as np

from tec_mollm_tpu.config import Config
from tec_mollm_tpu.data.dataset import BatchLoader, SlidingWindowDataset
from tec_mollm_tpu.data.scaler import StandardScaler
from tec_mollm_tpu.graph.builder import GraphData
from tec_mollm_tpu.models.baselines import WindowMeanBaseline
from tec_mollm_tpu.training.checkpoint import find_latest_checkpoint

logger = logging.getLogger(__name__)


def get_model_predictions(
    cfg: Config,
    params: Any,
    dataset: SlidingWindowDataset,
    graph: GraphData,
    batch_size: int = 16,
) -> tuple[np.ndarray, np.ndarray]:
    """Run inference over the whole dataset -> (y_true, y_pred), each
    (num_samples, L_out, N, 1) in scaled units. Materializes predictions on the
    host — prefer evaluate_model_streaming for metrics-only evaluation."""
    import jax
    import jax.numpy as jnp

    from tec_mollm_tpu.models import TECMoLLM
    from tec_mollm_tpu.models.tec_mollm import graph_inputs
    from tec_mollm_tpu.training.train_state import make_eval_step

    stencil_shifts, graph_dev = graph_inputs(graph)
    model = TECMoLLM(
        cfg.model,
        dtype=jnp.bfloat16 if cfg.train.bf16 else jnp.float32,
        stencil_shifts=stencil_shifts,
    )
    eval_step = jax.jit(make_eval_step(model, cfg))

    loader = BatchLoader(dataset, batch_size=batch_size, drop_remainder=False, prefetch=2)
    preds_all, trues_all = [], []
    for batch in loader:
        valid = batch.pop("valid")
        dev = jax.tree.map(jnp.asarray, batch)
        dev["valid"] = jnp.asarray(valid)
        _, preds, trues = eval_step(params, dev, graph_dev)
        n_valid = int(valid.sum())
        preds_all.append(np.asarray(preds)[:n_valid])
        trues_all.append(np.asarray(trues)[:n_valid])
    return np.concatenate(trues_all), np.concatenate(preds_all)


def evaluate_model_streaming(
    cfg: Config,
    params: Any,
    dataset: SlidingWindowDataset,
    graph: GraphData,
    scaler: StandardScaler | None,
    batch_size: int = 16,
) -> dict[str, Any]:
    """Inference + metrics without materializing predictions on the host: each
    batch reduces to (L_out, 8) sufficient statistics on device
    (evaluation/streaming.py). Exact same numbers as evaluate_horizons."""
    import jax
    import jax.numpy as jnp

    from tec_mollm_tpu.evaluation.streaming import StreamingHorizonMetrics
    from tec_mollm_tpu.models import TECMoLLM
    from tec_mollm_tpu.models.tec_mollm import graph_inputs
    from tec_mollm_tpu.training.train_state import make_eval_step

    stencil_shifts, graph_dev = graph_inputs(graph)
    model = TECMoLLM(
        cfg.model,
        dtype=jnp.bfloat16 if cfg.train.bf16 else jnp.float32,
        stencil_shifts=stencil_shifts,
    )
    eval_step = jax.jit(make_eval_step(model, cfg))
    acc = StreamingHorizonMetrics(cfg.train.L_out, scaler)
    loader = BatchLoader(dataset, batch_size=batch_size, drop_remainder=False, prefetch=2)
    for batch in loader:
        valid = batch.pop("valid")
        dev = jax.tree.map(jnp.asarray, batch)
        valid_dev = jnp.asarray(valid)
        dev["valid"] = valid_dev
        _, preds, trues = eval_step(params, dev, graph_dev)
        acc.update(trues, preds, valid_dev)
    return acc.finalize()


def host_targets(dataset: SlidingWindowDataset) -> np.ndarray:
    """All targets in the model's output layout (num_samples, L_out, N, 1), taken
    straight from the dataset on the host (no device round trip).

    WARNING: materializes the whole split — fine for tests/small splits; the wired
    eval path streams instead (evaluate_baseline_streaming)."""
    idxs = np.arange(len(dataset))
    y = dataset.gather_batch(idxs)["y"]  # (S, N, L_out)
    return y.transpose(0, 2, 1)[..., None]


def get_baseline_predictions(dataset: SlidingWindowDataset, L_out: int) -> np.ndarray:
    """(num_samples, L_out, N, 1) — scaled window-mean of the TEC channel.

    WARNING: materializes the whole split (see host_targets)."""
    return WindowMeanBaseline().predict_dataset(dataset, L_out)


def evaluate_baseline_streaming(
    dataset: SlidingWindowDataset,
    L_out: int,
    scaler: StandardScaler | None,
    batch_size: int = 64,
) -> dict[str, Any]:
    """Window-mean HA baseline scored at O(batch) host memory.

    Round-1 weak #2: the previous path gathered the ENTIRE stride-1 test split on
    the host (~29 GB of x windows at the real 2024-25 scale). Here each batch's
    window-mean prediction reduces to the same (L_out, 8) sufficient statistics as
    the model path, so baseline and model evals share one memory profile and one
    metric implementation (reference test.py:46-71 semantics)."""
    import jax.numpy as jnp

    from tec_mollm_tpu.evaluation.streaming import StreamingHorizonMetrics

    baseline = WindowMeanBaseline()
    acc = StreamingHorizonMetrics(L_out, scaler)
    loader = BatchLoader(
        dataset, batch_size=batch_size, drop_remainder=False, prefetch=2
    )
    for batch in loader:
        preds = baseline.predict_batch(batch["x"][..., 0], L_out)
        trues = batch["y"].transpose(0, 2, 1)[..., None]
        acc.update(
            jnp.asarray(trues), jnp.asarray(preds), jnp.asarray(batch["valid"])
        )
    return acc.finalize()


def improvement_report(model_metrics: dict, baseline_metrics: dict) -> dict[str, float]:
    """Improvement % per metric (reference test.py:243-256)."""
    out = {}
    out["mae_improvement_pct"] = (
        (baseline_metrics["mae_avg"] - model_metrics["mae_avg"])
        / baseline_metrics["mae_avg"] * 100.0
    )
    out["rmse_improvement_pct"] = (
        (baseline_metrics["rmse_avg"] - model_metrics["rmse_avg"])
        / baseline_metrics["rmse_avg"] * 100.0
    )
    out["r2_improvement_pct"] = (
        (model_metrics["r2_score_avg"] - baseline_metrics["r2_score_avg"])
        / abs(baseline_metrics["r2_score_avg"]) * 100.0
    )
    out["pearson_improvement_pct"] = (
        (model_metrics["pearson_r_avg"] - baseline_metrics["pearson_r_avg"])
        / baseline_metrics["pearson_r_avg"] * 100.0
    )
    return out


def write_results(
    results: dict[str, dict], improvements: dict[str, float], output_dir: str
) -> tuple[str, str]:
    """evaluation_results.csv + evaluation_summary.txt (reference test.py:260-278)."""
    os.makedirs(output_dir, exist_ok=True)
    csv_path = os.path.join(output_dir, "evaluation_results.csv")
    scalar_keys = ["mae_avg", "rmse_avg", "r2_score_avg", "pearson_r_avg"]
    horizon_keys = ["mae_by_horizon", "rmse_by_horizon", "r2_by_horizon", "pearson_by_horizon"]
    with open(csv_path, "w") as f:
        n_h = len(next(iter(results.values()))["mae_by_horizon"])
        cols = scalar_keys + [
            f"{k[:-11]}_h{h+1}" for k in horizon_keys for h in range(n_h)
        ]
        f.write("model," + ",".join(cols) + "\n")
        for name, m in results.items():
            vals = [f"{m[k]:.6f}" for k in scalar_keys]
            vals += [
                f"{m[k][h]:.6f}" for k in horizon_keys for h in range(n_h)
            ]
            f.write(name + "," + ",".join(vals) + "\n")

    txt_path = os.path.join(output_dir, "evaluation_summary.txt")
    with open(txt_path, "w") as f:
        f.write("TEC-MoLLM evaluation summary\n")
        f.write("=" * 50 + "\n\n")
        for name, m in results.items():
            f.write(f"{name}:\n")
            f.write(f"  MAE avg:      {m['mae_avg']:.6f}\n")
            f.write(f"  RMSE avg:     {m['rmse_avg']:.6f}\n")
            f.write(f"  R2 avg:       {m['r2_score_avg']:.6f}\n")
            f.write(f"  Pearson avg:  {m['pearson_r_avg']:.6f}\n\n")
        f.write("Improvement vs HistoricalAverage:\n")
        for k, v in improvements.items():
            f.write(f"  {k}: {v:+.2f}%\n")
    return csv_path, txt_path


def resolve_checkpoint(
    checkpoint: str, workdir: str = "."
) -> str:
    """'latest' -> most recent best_params dir; else use the given path."""
    if checkpoint == "latest":
        return find_latest_checkpoint(os.path.join(workdir, "checkpoints"))
    return checkpoint


def load_params_for_eval(cfg: Config, checkpoint_path: str, graph: GraphData) -> Any:
    """Restore best_params into a freshly initialized template."""
    import jax
    import jax.numpy as jnp
    import orbax.checkpoint as ocp

    from tec_mollm_tpu.models import TECMoLLM

    m = cfg.model
    model = TECMoLLM(m)
    x = jnp.zeros((1, m.temporal_seq_len, m.num_nodes, m.in_features))
    tf = jnp.zeros((1, m.temporal_seq_len, 4), jnp.int32)
    template = model.init(
        jax.random.key(0), x, tf,
        jnp.asarray(graph.neighbors), jnp.asarray(graph.neighbor_mask),
    )["params"]
    return ocp.StandardCheckpointer().restore(
        os.path.abspath(checkpoint_path), jax.device_get(template)
    )


def run_rollout_eval(
    cfg: Config,
    data_dir: str,
    checkpoint: str,
    rollout_steps: int,
    num_windows: int = 8,
    output_dir: str = "results",
    workdir: str = ".",
) -> dict[str, Any]:
    """Autoregressive rollout beyond L_out on the test split (BASELINE config 5).

    Takes `num_windows` evenly spaced test windows, rolls each out
    `rollout_steps` steps feeding predictions back, and scores against the true
    TEC (physical units, reference clip semantics). Exogenous space-weather and
    time features come from the observed data."""
    import numpy as np

    from tec_mollm_tpu.evaluation.rollout import autoregressive_rollout

    cfg = cfg.resolved()
    L_in = cfg.train.L_in
    L_out = cfg.train.L_out
    total = -(-rollout_steps // L_out) * L_out

    with np.load(os.path.join(data_dir, "test_set.npz")) as d:
        X = d["X"]  # (T, N, C) feature-scaled
        TF = d["time_features"]
    graph = GraphData.load(os.path.join(data_dir, "graph.npz"))
    fscaler = StandardScaler.load(os.path.join(data_dir, "scaler.npz"))
    tscaler = StandardScaler.load(os.path.join(data_dir, "target_scaler.npz"))

    max_start = X.shape[0] - L_in - total
    if max_start < 0:
        raise ValueError(
            f"test split too short for a {rollout_steps}-step rollout "
            f"(need {L_in + total} steps, have {X.shape[0]})"
        )
    starts = np.unique(np.linspace(0, max_start, num_windows, dtype=np.int64))

    ckpt_path = resolve_checkpoint(checkpoint, workdir)
    params = load_params_for_eval(cfg, ckpt_path, graph)

    x_init = np.stack([X[s : s + L_in] for s in starts])
    tf_full = np.stack([TF[s : s + L_in + total] for s in starts])
    sw_future = np.stack(
        [X[s + L_in : s + L_in + total, 0, 1:] for s in starts]
    )  # indices are node-constant; take node 0
    preds_scaled = autoregressive_rollout(
        cfg, params, graph, x_init, tf_full, sw_future, rollout_steps,
        feature_scaler=fscaler, target_scaler=tscaler,
    )  # (W, steps, N, 1) target-scaled

    # truths: feature-scaled TEC channel -> physical
    truth_scaled = np.stack(
        [X[s + L_in : s + L_in + rollout_steps, :, 0] for s in starts]
    )[..., None]
    truth_phys = (
        truth_scaled * fscaler.scale_[0] + fscaler.mean_[0]
    )
    preds_phys = preds_scaled * tscaler.scale_[0] + tscaler.mean_[0]
    preds_phys = np.clip(preds_phys, 0.0, 200.0)

    err = preds_phys - truth_phys
    per_step_mae = np.abs(err).mean(axis=(0, 2, 3))
    per_step_rmse = np.sqrt((err**2).mean(axis=(0, 2, 3)))
    result = {
        "rollout_steps": rollout_steps,
        "num_windows": int(len(starts)),
        "mae_avg": float(per_step_mae.mean()),
        "rmse_avg": float(per_step_rmse.mean()),
        "mae_by_step": per_step_mae.tolist(),
        "rmse_by_step": per_step_rmse.tolist(),
    }
    os.makedirs(output_dir, exist_ok=True)
    path = os.path.join(output_dir, "rollout_results.csv")
    with open(path, "w") as f:
        f.write("step,mae,rmse\n")
        for i, (a, r) in enumerate(zip(per_step_mae, per_step_rmse), 1):
            f.write(f"{i},{a:.6f},{r:.6f}\n")
    logger.info(
        "rollout %d steps over %d windows: MAE %.4f RMSE %.4f (-> %s)",
        rollout_steps, len(starts), result["mae_avg"], result["rmse_avg"], path,
    )
    return result


def run_prediction(
    cfg: Config,
    data_dir: str,
    checkpoint: str,
    split: str = "test",
    indices: list[int] | None = None,
    output_dir: str = "results",
    workdir: str = ".",
) -> dict[str, Any]:
    """Pure forecasting entry (beyond the reference, which only scores): run the
    model on selected windows of a processed split and write PHYSICAL-unit TEC
    forecasts (TECU, reference clip semantics: metrics.py contract, [0, 200]).

    indices are window starts into the stride-1 split; default is the most
    recent window. Writes forecast.npz {indices, forecast, truth} with
    (W, L_out, N) arrays and returns the same as a dict."""
    import jax
    import jax.numpy as jnp

    from tec_mollm_tpu.models import TECMoLLM
    from tec_mollm_tpu.models.tec_mollm import graph_inputs
    from tec_mollm_tpu.training.train_state import make_eval_step

    cfg = cfg.resolved()
    ds = SlidingWindowDataset.from_dir(
        data_dir, split, cfg.train.L_in, cfg.train.L_out, stride=1
    )
    if len(ds) == 0:
        raise ValueError(f"split '{split}' has no complete windows")
    graph = GraphData.load(os.path.join(data_dir, "graph.npz"))
    tscaler_path = os.path.join(data_dir, "target_scaler.npz")
    tscaler = StandardScaler.load(tscaler_path) if os.path.exists(tscaler_path) else None

    if indices is None:
        indices = [len(ds) - 1]
    idx = np.asarray(indices, dtype=np.int64)
    if (idx < 0).any() or (idx >= len(ds)).any():
        raise ValueError(f"window indices {indices} out of range [0, {len(ds)})")

    params = load_params_for_eval(cfg, resolve_checkpoint(checkpoint, workdir), graph)
    stencil_shifts, graph_dev = graph_inputs(graph)
    model = TECMoLLM(
        cfg.model,
        dtype=jnp.bfloat16 if cfg.train.bf16 else jnp.float32,
        stencil_shifts=stencil_shifts,
    )
    eval_step = jax.jit(make_eval_step(model, cfg))
    batch = jax.tree.map(jnp.asarray, ds.gather_batch(idx))
    _, preds, trues = eval_step(params, batch, graph_dev)

    def to_physical(a: jnp.ndarray) -> np.ndarray:
        a = np.asarray(a, dtype=np.float64)[..., 0]  # (W, L_out, N)
        if tscaler is not None:
            a = a * tscaler.scale_[0] + tscaler.mean_[0]
        return np.nan_to_num(a)

    forecast = np.clip(to_physical(preds), 0.0, 200.0)
    truth = to_physical(trues)

    os.makedirs(output_dir, exist_ok=True)
    out_path = os.path.join(output_dir, "forecast.npz")
    np.savez(out_path, indices=idx, forecast=forecast, truth=truth)
    mae = float(np.abs(forecast - truth).mean())
    logger.info(
        "forecast %d window(s) of split '%s' -> %s (MAE vs observed: %.4f TECU)",
        len(idx), split, out_path, mae,
    )
    return {"indices": idx.tolist(), "forecast": forecast, "truth": truth,
            "path": out_path, "mae": mae}


def run_evaluation(
    cfg: Config,
    data_dir: str,
    checkpoint: str,
    output_dir: str = "results",
    batch_size: int = 16,
    workdir: str = ".",
) -> dict[str, Any]:
    cfg = cfg.resolved()
    test_ds = SlidingWindowDataset.from_dir(
        data_dir, "test", cfg.train.L_in, cfg.train.L_out, stride=1
    )
    graph = GraphData.load(os.path.join(data_dir, "graph.npz"))
    tscaler_path = os.path.join(data_dir, "target_scaler.npz")
    scaler = StandardScaler.load(tscaler_path) if os.path.exists(tscaler_path) else None

    ckpt_path = resolve_checkpoint(checkpoint, workdir)
    logger.info("checkpoint: %s", ckpt_path)
    params = load_params_for_eval(cfg, ckpt_path, graph)

    logger.info("running model inference over %d test windows", len(test_ds))
    # both paths stream: each batch reduces to (L_out, 8) sufficient statistics,
    # so stride-1 full-split eval needs O(batch) host memory
    model_metrics = evaluate_model_streaming(
        cfg, params, test_ds, graph, scaler, batch_size
    )
    results = {
        "TEC-MoLLM": model_metrics,
        "HistoricalAverage": evaluate_baseline_streaming(
            test_ds, cfg.train.L_out, scaler
        ),
    }
    improvements = improvement_report(results["TEC-MoLLM"], results["HistoricalAverage"])
    csv_path, txt_path = write_results(results, improvements, output_dir)
    logger.info("results: %s, %s", csv_path, txt_path)
    for name, m in results.items():
        logger.info(
            "%s: MAE %.4f RMSE %.4f R2 %.4f r %.4f",
            name, m["mae_avg"], m["rmse_avg"], m["r2_score_avg"], m["pearson_r_avg"],
        )
    logger.info(
        "improvement vs HA: MAE %+.2f%% RMSE %+.2f%%",
        improvements["mae_improvement_pct"], improvements["rmse_improvement_pct"],
    )
    return {"results": results, "improvements": improvements}
