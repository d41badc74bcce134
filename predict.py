"""Forecast CLI: trained checkpoint -> physical-unit TEC forecasts for chosen windows.

Beyond the reference surface (which only scores, /root/reference/test.py): this is
the serving-style entry — pick windows of a processed split (default: the most
recent test window) and write inverse-scaled, [0, 200]-clipped TECU forecasts.

    python predict.py --data-dir data/processed --checkpoint latest
    python predict.py --data-dir /tmp/proc --checkpoint ckpt/best_params \
        --indices 0 100 200 --split val
"""

from __future__ import annotations

import argparse


def main() -> None:
    p = argparse.ArgumentParser(description="TEC-MoLLM forecast from a checkpoint")
    p.add_argument("--data-dir", default="data/processed")
    p.add_argument("--workdir", default=".")
    p.add_argument("--checkpoint", default="latest",
                   help="'latest' or a best_params checkpoint directory")
    p.add_argument("--run-name", default=None,
                   help="restrict 'latest' resolution to one run")
    p.add_argument("--split", default="test", choices=["train", "val", "test"])
    p.add_argument("--indices", type=int, nargs="*", default=None,
                   help="window start indices (stride-1); default: most recent")
    p.add_argument("--output-dir", default="results")
    p.add_argument("--config", default=None,
                   help="preset name or config json (e.g. checkpoints/<run>/config.json)")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax

    from tec_mollm_tpu.evaluation.harness import run_prediction
    from tec_mollm_tpu.utils.logging import setup_logging

    setup_logging(process_index=jax.process_index())

    from tec_mollm_tpu.evaluation.harness import resolve_cli_config

    cfg, checkpoint = resolve_cli_config(
        args.config, args.checkpoint, args.workdir, args.run_name
    )

    run_prediction(
        cfg.resolved(),
        data_dir=args.data_dir,
        checkpoint=checkpoint,
        split=args.split,
        indices=args.indices,
        output_dir=args.output_dir,
        workdir=args.workdir,
        run_name=args.run_name,
    )


if __name__ == "__main__":
    main()
