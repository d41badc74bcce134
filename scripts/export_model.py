"""Export a trained checkpoint to a self-contained StableHLO artifact.

    python scripts/export_model.py --data-dir data/processed \
        --checkpoint latest --out exports/model.stablehlo [--platforms tpu cpu]

The artifact bakes in params + graph tables; serving it needs only jax
(`tec_mollm_tpu.serving.export.load_forecaster`), no model code or checkpoint.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser(description="Export checkpoint to StableHLO")
    p.add_argument("--data-dir", default="data/processed",
                   help="processed dir (graph.npz is baked into the artifact)")
    p.add_argument("--workdir", default=".")
    p.add_argument("--checkpoint", default="latest")
    p.add_argument("--run-name", default=None)
    p.add_argument("--config", default=None)
    p.add_argument("--out", default="exports/model.stablehlo")
    p.add_argument("--batch-size", type=int, default=None,
                   help="pin the batch dim (default: symbolic, any B)")
    p.add_argument("--platforms", nargs="+", default=["tpu", "cpu"])
    p.add_argument("--cpu", action="store_true",
                   help="run the export itself on the CPU backend")
    args = p.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax

    from tec_mollm_tpu.evaluation.harness import (
        load_params_for_eval,
        resolve_cli_config,
        warn_on_config_mismatch,
    )
    from tec_mollm_tpu.graph.builder import GraphData
    from tec_mollm_tpu.serving.export import export_forecaster, save_exported
    from tec_mollm_tpu.utils.logging import setup_logging

    setup_logging(process_index=jax.process_index())
    cfg, checkpoint = resolve_cli_config(
        args.config, args.checkpoint, args.workdir, args.run_name
    )
    cfg = cfg.resolved()
    graph = GraphData.load(os.path.join(args.data_dir, "graph.npz"))
    warn_on_config_mismatch(cfg, checkpoint)
    params = load_params_for_eval(cfg, checkpoint, graph)
    blob = export_forecaster(
        cfg, params, graph,
        batch_size=args.batch_size, platforms=tuple(args.platforms),
    )
    save_exported(
        blob, args.out,
        meta={
            "checkpoint": checkpoint,
            "platforms": args.platforms,
            "batch": args.batch_size or "symbolic",
            "L_in": cfg.train.L_in,
            "L_out": cfg.train.L_out,
            "num_nodes": cfg.model.num_nodes,
            "in_features": cfg.model.in_features,
            "dtype": "bfloat16" if cfg.train.bf16 else "float32",
        },
    )
    print(args.out)


if __name__ == "__main__":
    main()
