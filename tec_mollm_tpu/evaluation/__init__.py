from tec_mollm_tpu.evaluation.metrics import evaluate_metrics, evaluate_horizons

__all__ = ["evaluate_metrics", "evaluate_horizons"]
