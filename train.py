"""Training CLI.

Replaces the reference's `torchrun --nproc_per_node=K train.py ...`
(/root/reference/train.py:170-463) with a jax-native launcher: one process per host,
devices discovered via jax, DP/TP laid out on a jax.sharding.Mesh. Flags mirror the
reference's argparse surface (train.py:170-198) plus resume / mesh / config-file
controls the reference lacks.

Examples:
    python train.py --data-dir data/processed --epochs 50
    python train.py --data-dir /tmp/proc --epochs 2 --batch-size 2 --llm-layers 1
    python train.py --config run_config.json --resume
"""

from __future__ import annotations

import argparse
import dataclasses
import logging
import os

logger = logging.getLogger(__name__)


def parse_args() -> argparse.Namespace:
    p = argparse.ArgumentParser(description="Train TEC-MoLLM (TPU-native)")
    # data
    p.add_argument("--data-dir", default="data/processed")
    p.add_argument("--workdir", default=".")
    # Flag defaults are None sentinels: an UNSET flag falls back to the config's
    # value (the dataclass default, or the --config/preset file's), while a SET
    # flag always wins — `--config scale_up --epochs 5` must not silently run
    # the preset's epoch count. Reference defaults: train.py:170-198.
    p.add_argument("--L-in", type=int, default=None, help="default 48")
    p.add_argument("--L-out", type=int, default=None, help="default 12")
    p.add_argument("--train-stride", type=int, default=None, help="default 12")
    p.add_argument("--val-stride", type=int, default=None,
                   help="validation window stride (default 1, the reference's "
                        "train.py:289; coarser strides cut per-epoch validation "
                        "cost on full-scale archives — final test.py eval stays "
                        "stride 1)")
    p.add_argument("--val-tail-frac", type=float, default=None,
                   help="select checkpoints on only the chronologically last "
                        "fraction of validation windows (default 1.0 = full "
                        "period). Under distribution shift (solar cycle) the "
                        "val tail proxies the test epoch; full-period val can "
                        "rank arms backwards (BASELINE.md)")
    # training (reference defaults, train.py:170-198)
    p.add_argument("--epochs", type=int, default=None, help="default 50")
    p.add_argument("--batch-size", type=int, default=None,
                   help="microbatch per replica (default 2)")
    p.add_argument("--accumulation-steps", type=int, default=None, help="default 6")
    p.add_argument("--lr", type=float, default=None, help="default 1e-4")
    p.add_argument("--weight-decay", type=float, default=None, help="default 1e-2")
    p.add_argument("--patience", type=int, default=None, help="default 20")
    p.add_argument("--min-delta", type=float, default=None, help="default 1e-4")
    p.add_argument("--seed", type=int, default=None, help="default 0")
    p.add_argument("--checkpoint-every-steps", type=int, default=None,
                   help="mid-epoch resumable checkpoint every N macro steps "
                        "(default 0 = epoch boundaries only); bounds the work "
                        "lost to hard failures on long epochs")
    p.add_argument("--ema-decay", type=float, default=None,
                   help="exponential-moving-average decay for the trainable "
                        "params (beyond-reference; e.g. 0.999). Validation and "
                        "the saved best checkpoint use the EMA weights; 0 "
                        "(default) disables")
    # model
    p.add_argument("--d-emb", type=int, default=None, help="default 16")
    p.add_argument("--llm-layers", type=int, default=None, help="default 3")
    p.add_argument("--revin", action="store_true",
                   help="RevIN-style per-window instance normalization of the "
                        "TEC channel (beyond-reference; at init the model "
                        "predicts the Historical-Average baseline and learns "
                        "deviations). Recorded in config.json, so eval CLIs "
                        "pick it up automatically")
    p.add_argument("--quantiles", type=float, nargs="+", default=None,
                   metavar="Q",
                   help="probabilistic head (beyond-reference): train one "
                        "forecast per quantile level with pinball loss, e.g. "
                        "--quantiles 0.1 0.5 0.9. Must include 0.5 (the point "
                        "forecast); eval adds pinball/calibration/coverage "
                        "metrics. Recorded in config.json")
    # parallel / precision
    p.add_argument("--model-parallel", type=int, default=None, help="default 1")
    p.add_argument("--no-bf16", action="store_true")
    # tri-state remat: default follows the config default (off at the default
    # config per the settled A/B — a plain `python train.py` must not silently pay
    # the measured ~23% step-time cost; ADVICE r1)
    p.add_argument("--remat", action="store_true",
                   help="enable LLM gradient rematerialization (needed for large "
                        "configs, e.g. scale_up at B>=2)")
    p.add_argument("--no-remat", action="store_true",
                   help="force remat off (overrides --config/preset policy)")
    p.add_argument("--cpu", action="store_true", help="force CPU backend")
    p.add_argument("--device-data", action="store_true",
                   help="device-resident archive mode: keep the split's raw "
                        "series (~0.5 GB at 13-year scale) in HBM and gather "
                        "windows on device — the host ships only window-start "
                        "indices per step. Makes stride-1 archive training "
                        "compute-bound instead of input-bound; needs the "
                        "*_raw.npz files the preprocess CLI writes")
    # lifecycle
    p.add_argument("--multihost", action="store_true",
                   help="call jax.distributed.initialize() (multi-host pods; "
                        "replaces the torchrun RANK/WORLD_SIZE contract)")
    p.add_argument("--profile-dir", default=None,
                   help="write a jax.profiler trace of epoch 0 to this directory")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--run-name", default=None)
    p.add_argument("--config", default=None, help="preset name (default/scale_up/long_horizon/scaled_backbone/operational) or config json path")
    p.add_argument("--gpt2-checkpoint", default=None,
                   help="torch GPT-2/peft state_dict (.pt/.bin) or HF dir to import")
    args = p.parse_args()
    if args.remat and args.no_remat:
        p.error("--remat and --no-remat are mutually exclusive")
    return args


def build_config(args: argparse.Namespace):
    from tec_mollm_tpu.config import Config, ModelConfig, TrainConfig

    # every flag the user actually passed, as dataclass-field overrides
    train_over = {
        k: v
        for k, v in {
            "L_in": args.L_in,
            "L_out": args.L_out,
            "train_stride": args.train_stride,
            "val_stride": args.val_stride,
            "val_tail_frac": args.val_tail_frac,
            "epochs": args.epochs,
            "batch_size": args.batch_size,
            "accumulation_steps": args.accumulation_steps,
            "lr": args.lr,
            "weight_decay": args.weight_decay,
            "patience": args.patience,
            "min_delta": args.min_delta,
            "seed": args.seed,
            "checkpoint_every_steps": args.checkpoint_every_steps,
            "ema_decay": args.ema_decay,
            "model_parallel": args.model_parallel,
        }.items()
        if v is not None
    }
    if args.remat or args.no_remat:
        train_over["remat_llm"] = args.remat
    if args.no_bf16:
        train_over["bf16"] = False
    if args.device_data:
        train_over["device_data"] = True
    model_over = {
        k: v
        for k, v in {"d_emb": args.d_emb, "llm_layers": args.llm_layers}.items()
        if v is not None
    }
    if args.revin:
        model_over["revin"] = True
    if args.quantiles is not None:
        model_over["quantiles"] = tuple(args.quantiles)

    if args.config:
        from tec_mollm_tpu.config import load_config

        cfg = load_config(args.config)
    else:
        cfg = Config(model=ModelConfig(), train=TrainConfig())
    if train_over or model_over:
        cfg = dataclasses.replace(
            cfg,
            model=dataclasses.replace(cfg.model, **model_over),
            train=dataclasses.replace(cfg.train, **train_over),
        )
    return cfg.resolved()


def main() -> None:
    args = parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax

    if args.multihost:
        jax.distributed.initialize()

    from tec_mollm_tpu.data.dataset import SlidingWindowDataset
    from tec_mollm_tpu.data.scaler import StandardScaler
    from tec_mollm_tpu.graph.builder import GraphData
    from tec_mollm_tpu.training.trainer import Trainer
    from tec_mollm_tpu.utils.logging import setup_logging

    setup_logging(process_index=jax.process_index())
    cfg = build_config(args)

    data_dir = args.data_dir
    if cfg.train.device_data:
        from tec_mollm_tpu.data.device_data import DeviceResidentDataset

        def make_ds(mode, stride, tail_frac=1.0):
            return DeviceResidentDataset(
                data_dir, mode, cfg.train.L_in, cfg.train.L_out,
                stride=stride, tail_frac=tail_frac,
            )
    else:
        def make_ds(mode, stride, tail_frac=1.0):
            return SlidingWindowDataset.from_dir(
                data_dir, mode, cfg.train.L_in, cfg.train.L_out,
                stride=stride, tail_frac=tail_frac,
            )

    train_ds = make_ds("train", cfg.train.train_stride)
    val_ds = make_ds("val", cfg.train.val_stride, tail_frac=cfg.train.val_tail_frac)
    if len(val_ds) == 0:
        logger.warning("validation split empty; training without validation")
        val_ds = None
    graph = GraphData.load(os.path.join(data_dir, "graph.npz"))
    tscaler_path = os.path.join(data_dir, "target_scaler.npz")
    target_scaler = StandardScaler.load(tscaler_path) if os.path.exists(tscaler_path) else None

    logger.info(
        "devices: %d x %s | effective batch %d",
        jax.device_count(),
        jax.devices()[0].platform,
        cfg.train.batch_size * cfg.train.accumulation_steps
        * (jax.device_count() // cfg.train.model_parallel),
    )

    trainer = Trainer(
        cfg, train_ds, val_ds, graph, target_scaler,
        workdir=args.workdir, run_name=args.run_name,
    )
    # persist the exact config used alongside the checkpoints BEFORE training:
    # a run interrupted mid-epoch (SIGTERM, crash, preemption) must still leave
    # eval CLIs able to reconstruct the model (resolve_cli_config reads this) —
    # primary process only, like every other checkpoint-dir write. EXCEPT on
    # resume: a resume launched with the wrong flags must not clobber the valid
    # config record of the existing checkpoint before the restore has proven
    # the configs compatible (fit() re-writes it after a successful restore).
    config_path = os.path.join(trainer.ckpt.dir, "config.json")
    if jax.process_index() == 0 and not (args.resume and os.path.exists(config_path)):
        with open(config_path, "w") as f:
            f.write(cfg.to_json())

    if args.gpt2_checkpoint:
        from tec_mollm_tpu.models.hf_import import (
            load_gpt2_into_model_params,
            load_torch_checkpoint,
        )

        sd = load_torch_checkpoint(args.gpt2_checkpoint)
        params = load_gpt2_into_model_params(
            jax.device_get(trainer.state.params), sd, cfg.model
        )
        trainer.set_params(params)
        logger.info("imported GPT-2 weights from %s", args.gpt2_checkpoint)

    if args.profile_dir:
        import jax.numpy as jnp

        from tec_mollm_tpu.utils.profiler import trace

        # the profiled epoch must leave no trace in training: snapshot the
        # state (deep copy — the jitted step donates its input buffers) and
        # restore it afterwards, so the run trains exactly `--epochs` epochs
        # whether or not it was profiled
        snapshot = jax.tree.map(jnp.copy, trainer.state)
        with trace(args.profile_dir):
            trainer.epoch = 0
            trainer.train_epoch()
        trainer.state = snapshot
        logger.info("profiler trace written to %s", args.profile_dir)

    history = trainer.fit(resume=args.resume)
    if args.resume and jax.process_index() == 0:
        # the restore succeeded (fit returned), so the resumed flags are
        # proven compatible — NOW they become the run's config of record
        with open(config_path, "w") as f:
            f.write(cfg.to_json())
    if history:
        last = history[-1]
        logger.info(
            "finished: epoch %d best_val %.6f", last["epoch"], trainer.best_val_loss
        )


if __name__ == "__main__":
    main()
