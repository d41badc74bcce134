"""Interleaved same-process A/B of train-step model variants (CLAUDE.md rule 5:
single-run deltas under ~25% are tunnel noise; interleave chunks so ambient load
hits every variant equally).

    python scripts/ab_variants.py --variants base two_pass_ln fuse_conv
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VARIANTS = {
    "base": {},  # model defaults (lean_ln on since the settled +1.1% A/B)
    "two_pass_ln": {"lean_ln": False},
    "lean_gn": {"lean_gn": True},
    "fused_attn": {"fused_attn": True},
    "unroll8": {"unroll_max_seq": 8},
    "unroll21": {"unroll_max_seq": 21},
    "fuse_conv": {"fuse_conv": True},
    "fused_mlp": {"use_fused_mlp": True},
    # DESIGN §20 shape experiments (round 4): pad_nodes measured +1.5% train /
    # +11.4% eval -> now the model DEFAULT; no_pad is the ablation arm
    "pad_nodes": {"pad_nodes_to": 128},
    "no_pad": {"pad_nodes_to": 0},
    "im2col": {"im2col_conv": True},
    "pad_im2col": {"pad_nodes_to": 128, "im2col_conv": True},
}


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--variants", nargs="+", default=["base", "two_pass_ln"],
                   choices=sorted(VARIANTS))
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--steps", type=int, default=10, help="steps per chunk")
    p.add_argument("--rounds", type=int, default=4, help="interleaved rounds")
    p.add_argument("--preset", default="default")
    p.add_argument("--eval", action="store_true")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import dataclasses

    import jax
    import jax.numpy as jnp

    from tec_mollm_tpu.config import PRESETS
    from tec_mollm_tpu.data.dataset import SlidingWindowDataset
    from tec_mollm_tpu.data.synthetic import grid_coordinates, synthetic_processed_split
    from tec_mollm_tpu.graph import build_graph
    from tec_mollm_tpu.models import TECMoLLM
    from tec_mollm_tpu.models.tec_mollm import graph_inputs
    from tec_mollm_tpu.training.train_state import (
        create_train_state,
        make_eval_step,
        make_train_step,
    )

    cfg = PRESETS[args.preset]()
    cfg = dataclasses.replace(
        cfg,
        train=dataclasses.replace(
            cfg.train, batch_size=args.batch_size, accumulation_steps=1
        ),
    )
    m = cfg.model
    lat, lon = grid_coordinates(m.grid_h, m.grid_w)
    graph_np = build_graph(lat, lon, distance_threshold_km=cfg.data.distance_threshold_km)
    shifts, graph = graph_inputs(graph_np)
    split = synthetic_processed_split(
        num_windows=args.batch_size + 1, L_in=cfg.train.L_in, L_out=cfg.train.L_out,
        num_nodes=m.num_nodes, seed=0,
    )
    ds = SlidingWindowDataset(split, cfg.train.L_in, cfg.train.L_out)
    batch_np = ds.gather_batch(np.arange(args.batch_size) % max(len(ds), 1))
    batch = jax.tree.map(jnp.asarray, batch_np)
    dtype = jnp.bfloat16 if cfg.train.bf16 else jnp.float32

    runners = {}
    for name in args.variants:
        model = TECMoLLM(
            m, dtype=dtype, remat_llm=cfg.train.remat_llm, stencil_shifts=shifts,
            **VARIANTS[name],
        )
        state, tx, _ = create_train_state(
            model, cfg, jax.random.key(0, impl=cfg.train.prng_impl), batch_np, graph,
            frozen_dtype=dtype if cfg.train.bf16 else None,
        )
        if args.eval:
            merged = state.params
            fn = jax.jit(make_eval_step(model, cfg))

            def run(fn=fn, merged=merged):
                loss, _, _ = fn(merged, batch, graph)
                return loss
        else:
            step_fn = jax.jit(make_train_step(model, cfg, tx), donate_argnums=0)
            holder = {"s": state}

            def run(step_fn=step_fn, holder=holder):
                holder["s"], metrics = step_fn(holder["s"], batch, graph)
                return metrics["loss"]

        for _ in range(2):  # compile + warm
            out = run()
        float(out)
        runners[name] = run
        print(f"compiled {name}", flush=True)

    best = {name: float("inf") for name in runners}
    for r in range(args.rounds):
        for name, run in runners.items():
            t0 = time.perf_counter()
            for _ in range(args.steps):
                out = run()
            float(out)  # hard sync
            dt = (time.perf_counter() - t0) / args.steps
            best[name] = min(best[name], dt)
        print(json.dumps({"round": r, **{k: round(v * 1e3, 2) for k, v in best.items()}}),
              flush=True)

    base_name = args.variants[0]
    result = {
        "mode": "eval" if args.eval else "train",
        "B": args.batch_size,
        "ms_per_step": {k: round(v * 1e3, 3) for k, v in best.items()},
        "windows_per_sec": {
            k: round(args.batch_size / v, 2) for k, v in best.items()
        },
        "speedup_vs_first": {
            k: round(best[base_name] / v, 4) for k, v in best.items()
        },
    }
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    sys.exit(main())
