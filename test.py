"""Evaluation CLI: model vs Historical-Average baseline on the test split.

Replaces /root/reference/test.py. Examples:
    python test.py --data-dir data/processed --checkpoint latest
    python test.py --data-dir /tmp/proc --checkpoint checkpoints/run/best_params
"""

from __future__ import annotations

import argparse


def main() -> None:
    p = argparse.ArgumentParser(description="Evaluate TEC-MoLLM vs HA baseline")
    p.add_argument("--data-dir", default="data/processed")
    p.add_argument("--workdir", default=".")
    p.add_argument("--checkpoint", default="latest",
                   help="'latest' or a best_params checkpoint directory")
    p.add_argument("--run-name", default=None,
                   help="restrict 'latest' resolution to one run (a mixed-"
                        "preset workdir otherwise evals whichever run "
                        "finished last)")
    p.add_argument("--output-dir", default="results")
    p.add_argument("--batch-size", type=int, default=None,
                   help="per-replica eval batch (default: the config's "
                        "eval_batch_size — preset-aware, e.g. 4 for scale_up)")
    p.add_argument("--L-in", type=int, default=48)
    p.add_argument("--L-out", type=int, default=12)
    p.add_argument("--d-emb", type=int, default=16)
    p.add_argument("--llm-layers", type=int, default=3)
    p.add_argument("--config", default=None,
                   help="preset name or config json (e.g. checkpoints/<run>/config.json); "
                        "overrides the individual model flags")
    p.add_argument("--baseline", action="append", default=[],
                   choices=["sarima"],
                   help="additional baseline rows (beyond the always-on HA): "
                        "'sarima' = first-party batched SARIMA(1,1,1)x"
                        "(1,1,1,s) fitted on the train split")
    p.add_argument("--sarima-season", type=int, default=12,
                   help="seasonal period s for --baseline sarima")
    p.add_argument("--split", default="test", choices=["train", "val", "test"],
                   help="which processed split to score (default test, the "
                        "reference's behavior). '--split val --tail-frac 0.3' "
                        "is the shift-aware model-selection probe")
    p.add_argument("--tail-frac", type=float, default=1.0,
                   help="score only the chronologically last fraction of the "
                        "split's windows (default 1.0 = all)")
    p.add_argument("--conformal", default="auto", metavar="MODE",
                   help="split-conformal calibration of the quantile head's "
                        "intervals (evaluation/conformal.py): 'fit' = "
                        "calibrate per-(horizon, level) offsets on the VAL "
                        "split and save conformal.npz next to the checkpoint; "
                        "'auto' (default) = use conformal.npz if present; "
                        "'off' = raw intervals only; or a path to an offsets "
                        "file. Conformal metrics appear as a second "
                        "probabilistic block + quantile_metrics_conformal.csv")
    p.add_argument("--conformal-mode", default="additive",
                   choices=["additive", "scale", "adaptive"],
                   help="with --conformal fit: 'additive' = per-(horizon, "
                        "level) TECU offsets; 'scale' = offsets in units of "
                        "the model's own band width (median + delta * "
                        "(hi - lo)); 'adaptive' = ROLLING recalibration on "
                        "the chronological test stream (offsets for window k "
                        "come from a decayed histogram of residuals whose "
                        "whole target range was observed before k's forecast "
                        "was issued) — the deployment-faithful calibration "
                        "under distribution shift, where every static fit "
                        "under-covers (BASELINE.md round 4)")
    p.add_argument("--conformal-decay", type=float, default=0.99,
                   help="per-batch exponential decay of the adaptive-mode "
                        "residual histogram (recency window)")
    p.add_argument("--conformal-level-gain", type=float, default=0.05,
                   help="ACI coverage-error feedback gain for adaptive mode "
                        "(steers out the systematic lag under monotone "
                        "drift); 0 = pure rolling recalibration")
    p.add_argument("--conformal-tail-frac", type=float, default=1.0,
                   help="with --conformal fit: calibrate on only the "
                        "chronologically last fraction of the val split "
                        "(residual scale drifts val->test; the tail is the "
                        "closest proxy for the deployment epoch)")
    p.add_argument("--rollout-steps", type=int, default=0,
                   help="also run an autoregressive rollout eval this many steps "
                        "beyond L_out (predictions fed back as inputs)")
    p.add_argument("--rollout-windows", type=int, default=8)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax

    from tec_mollm_tpu.config import Config, ModelConfig, TrainConfig
    from tec_mollm_tpu.evaluation.harness import run_evaluation
    from tec_mollm_tpu.utils.logging import setup_logging

    setup_logging(process_index=jax.process_index())

    from tec_mollm_tpu.evaluation.harness import resolve_cli_config

    cfg, checkpoint = resolve_cli_config(
        args.config, args.checkpoint, args.workdir, args.run_name,
        fallback=Config(
            model=ModelConfig(d_emb=args.d_emb, llm_layers=args.llm_layers),
            train=TrainConfig(L_in=args.L_in, L_out=args.L_out),
        ),
    )
    cfg = cfg.resolved()

    batch_size = (args.batch_size if args.batch_size is not None
                  else cfg.train.eval_batch_size)
    run_evaluation(
        cfg,
        data_dir=args.data_dir,
        checkpoint=checkpoint,
        output_dir=args.output_dir,
        batch_size=batch_size,
        workdir=args.workdir,
        run_name=args.run_name,
        baselines=tuple(args.baseline),
        sarima_season=args.sarima_season,
        split=args.split,
        tail_frac=args.tail_frac,
        conformal=None if args.conformal == "off" else args.conformal,
        conformal_tail_frac=args.conformal_tail_frac,
        conformal_mode=args.conformal_mode,
        conformal_decay=args.conformal_decay,
        conformal_level_gain=args.conformal_level_gain,
    )

    if args.rollout_steps > 0:
        from tec_mollm_tpu.evaluation.harness import run_rollout_eval

        run_rollout_eval(
            cfg,
            data_dir=args.data_dir,
            checkpoint=checkpoint,
            rollout_steps=args.rollout_steps,
            num_windows=args.rollout_windows,
            output_dir=args.output_dir,
            workdir=args.workdir,
            run_name=args.run_name,
        )


if __name__ == "__main__":
    main()
