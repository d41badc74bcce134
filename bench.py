"""Benchmark: train windows/sec/chip at L_in=48 / L_out=12 (BASELINE.md target).

Runs the FULL flagship training step (fwd+bwd+AdamW on the trainable partition,
bf16, optional grad-accum scan)
on synthetic data with the real 2911-node graph, on the available device(s), and
prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

vs_baseline is vs BASELINE.json `published` (the reference publishes no numbers —
SURVEY.md §6 — so the first recorded value of this harness becomes the baseline;
until then vs_baseline = 1.0).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch-size", type=int, default=None,
                        help="microbatch per step (default: the preset's; 8 for default)")
    parser.add_argument("--accum", type=int, default=None,
                        help="grad accumulation steps (default: the preset's)")
    parser.add_argument("--steps", type=int, default=20, help="timed optimizer updates")
    parser.add_argument("--warmup", type=int, default=3)
    parser.add_argument("--quick", action="store_true", help="tiny model, 3 steps (CI)")
    parser.add_argument("--cpu", action="store_true", help="force CPU backend")
    parser.add_argument("--no-remat", action="store_true", help="disable LLM remat")
    parser.add_argument("--remat-policy", default=None,
                        choices=["full", "dots_saveable", "nothing_saveable"],
                        help="jax.checkpoint policy when remat is on "
                             "(models/gpt2.REMAT_POLICIES)")
    parser.add_argument("--no-bf16", action="store_true", help="fp32 compute")
    parser.add_argument("--preset", default="default",
                        help="config preset: default | scale_up | long_horizon | "
                             "scaled_backbone | operational")
    parser.add_argument("--eval", action="store_true",
                        help="measure deterministic eval forward instead of the "
                             "train step")
    parser.add_argument("--fuse-conv", action="store_true",
                        help="fuse the 3 multi-scale conv branches into one conv")
    parser.add_argument("--two-pass-ln", action="store_true",
                        help="disable lean_ln (revert to two-pass fp32 LayerNorm)")
    args = parser.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import dataclasses

    import jax
    import jax.numpy as jnp

    from tec_mollm_tpu.config import PRESETS, tiny_config
    from tec_mollm_tpu.data.dataset import SlidingWindowDataset
    from tec_mollm_tpu.data.synthetic import grid_coordinates, synthetic_processed_split
    from tec_mollm_tpu.graph import build_graph
    from tec_mollm_tpu.models import TECMoLLM
    from tec_mollm_tpu.training.train_state import create_train_state, make_train_step

    if args.quick:
        cfg = tiny_config()
        steps = 3
    else:
        cfg = PRESETS[args.preset]()
        steps = args.steps
    cfg = dataclasses.replace(
        cfg,
        train=dataclasses.replace(
            cfg.train,
            # no flags -> default preset benches the published B=8 x accum 1
            # throughput config; other presets bench their own tuned policy
            # (e.g. scale_up ships B=1 x accum 8 no-remat since r3). Eval mode
            # runs one forward over the whole macro batch, so it benches the
            # config's tuned eval_batch_size x accum 1 instead.
            batch_size=args.batch_size if args.batch_size is not None
            else (cfg.train.eval_batch_size if args.eval
                  else 8 if args.preset == "default" and not args.quick
                  else cfg.train.batch_size),
            accumulation_steps=args.accum if args.accum is not None
            else (1 if (args.preset == "default" and not args.quick) or args.eval
                  else cfg.train.accumulation_steps),
            # respect the preset's remat policy; --no-remat forces it off, and
            # an explicit --remat-policy forces it ON (no shipped preset has
            # remat_llm=True since the r3 scale_up retune, so the flag would
            # otherwise silently bench the no-remat config)
            remat_llm=(cfg.train.remat_llm or args.remat_policy is not None)
            and not args.no_remat,
            bf16=not args.no_bf16,
        ),
    )
    m = cfg.model

    lat, lon = grid_coordinates(m.grid_h, m.grid_w)
    graph_np = build_graph(lat, lon, distance_threshold_km=cfg.data.distance_threshold_km)

    # Data-parallel over every local device (mp=1), exactly like the Trainer:
    # each chip runs the tuned per-chip policy and the macro batch is sharded
    # over the 'data' axis. With one device this is the original single-chip
    # bench; computing on one device while dividing by N would underreport
    # per-chip throughput N× on a multi-chip host.
    from tec_mollm_tpu.parallel.mesh import (
        batch_sharding,
        make_mesh,
        put_global,
        replicated_sharding,
    )
    from tec_mollm_tpu.parallel.partitioning import param_shardings

    n_chips = jax.local_device_count()
    mesh = make_mesh(data_parallel=n_chips, model_parallel=1)
    macro = cfg.train.batch_size * cfg.train.accumulation_steps * n_chips
    split = synthetic_processed_split(
        num_windows=macro + 1,
        L_in=cfg.train.L_in,
        L_out=cfg.train.L_out,
        num_nodes=m.num_nodes,
        seed=0,
    )
    ds = SlidingWindowDataset(split, cfg.train.L_in, cfg.train.L_out)
    batch_np = ds.gather_batch(np.arange(macro) % max(len(ds), 1))

    from tec_mollm_tpu.models.tec_mollm import graph_inputs

    stencil_shifts, graph = graph_inputs(graph_np)
    model = TECMoLLM(
        m,
        dtype=jnp.bfloat16 if cfg.train.bf16 else jnp.float32,
        remat_llm=cfg.train.remat_llm,
        remat_policy=args.remat_policy or cfg.train.remat_policy,
        stencil_shifts=stencil_shifts,
        fuse_conv=args.fuse_conv,
        lean_ln=not args.two_pass_ln,
    )
    rep = replicated_sharding(mesh)
    graph = tuple(put_global(a, rep) for a in graph)
    state, tx, mask = create_train_state(
        model, cfg, jax.random.key(0, impl=cfg.train.prng_impl), batch_np, graph,
        frozen_dtype=jnp.bfloat16 if cfg.train.bf16 else None,
    )
    # place every state leaf on the mesh (params per their specs — replicated
    # at mp=1; moments/step/rng replicated), same discipline as the Trainer
    state = state.replace(
        trainable=put_global(state.trainable, param_shardings(
            state.trainable, mesh, 1, cfg.train.model_axis)),
        frozen=put_global(state.frozen, param_shardings(
            state.frozen, mesh, 1, cfg.train.model_axis)),
        opt_state=put_global(state.opt_state, rep),
        step=put_global(state.step, rep),
        rng=put_global(state.rng, rep),
    )
    bsh = batch_sharding(mesh, cfg.train.data_axis)
    batch = jax.tree.map(lambda a: jax.device_put(jnp.asarray(a), bsh), batch_np)
    if args.eval:
        from tec_mollm_tpu.training.train_state import make_eval_step

        merged = state.params
        eval_fn = jax.jit(make_eval_step(model, cfg))

        def step_fn(state, batch, graph):  # same loop shape as the train path
            loss, _, _ = eval_fn(merged, batch, graph)
            return state, {"loss": loss}
    else:
        step_fn = jax.jit(make_train_step(model, cfg, tx), donate_argnums=0)

    # NOTE: hard host readback (float(...)) rather than block_until_ready — on the
    # tunneled axon backend block_until_ready returns at enqueue time, not
    # completion. Each step consumes the previous state, so one readback of the
    # final loss synchronizes the whole chain.
    for _ in range(args.warmup):
        state, metrics = step_fn(state, batch, graph)
    if args.warmup:
        float(metrics["loss"])  # hard sync; --warmup 0 times compile, its choice

    # time in chunks and report the fastest chunk (timeit-min convention): ambient
    # load on shared/tunneled backends only ever makes chunks slower
    chunk = max(1, min(5, steps))
    n_chunks = max(1, steps // chunk)
    best = float("inf")
    for _ in range(n_chunks):
        t0 = time.perf_counter()
        for _ in range(chunk):
            state, metrics = step_fn(state, batch, graph)
        float(metrics["loss"])
        best = min(best, time.perf_counter() - t0)

    windows_per_sec_per_chip = chunk * macro / best / n_chips

    baseline = None
    try:
        with open(os.path.join(os.path.dirname(__file__), "BASELINE.json")) as f:
            published = json.load(f).get("published", {})
        # compare like with like: eval throughput vs the eval baseline key
        baseline = published.get(
            "eval_windows_per_sec_per_chip" if args.eval
            else "train_windows_per_sec_per_chip"
        )
    except (OSError, json.JSONDecodeError):
        pass
    vs_baseline = (
        windows_per_sec_per_chip / baseline if baseline else 1.0
    )

    metric_name = (
        "eval_windows_per_sec_per_chip" if args.eval
        else "train_windows_per_sec_per_chip"
    )
    print(
        json.dumps(
            {
                "metric": metric_name,
                "value": round(windows_per_sec_per_chip, 3),
                "unit": "windows/s/chip",
                "vs_baseline": round(vs_baseline, 4),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
