"""Interleaved same-process A/B of TRAIN-CONFIG variants (batch/accum/remat/
remat-policy) — the scale-up single-chip question from VERDICT r2 weak #2:

    shipped preset  : B=2, accum=1, full remat       (r2: 2.35 w/s)
    r1 observation  : B=1, no remat                  (r1: 3.37 w/s, eff. B=1)
    candidates      : B=1 x accum {4,8} no-remat (same effective batch as the
                      preset without remat's ~30% recompute tax), and
                      B=2 selective remat (dots_saveable: keep MXU outputs,
                      recompute only the elementwise chain).

Each variant owns its train state (shapes differ); chunks interleave so
ambient tunnel load hits every variant equally (CLAUDE.md rule 5). Throughput
normalizes to windows/sec = B*accum / macro-step time.

    python scripts/ab_scaleup.py                 # scale_up preset, TPU
    python scripts/ab_scaleup.py --preset default --variants shipped b1a4
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# (batch_size, accumulation_steps, remat_llm, remat_policy)
VARIANTS: dict[str, tuple[int, int, bool, str | None]] = {
    "shipped": (2, 1, True, None),          # scale_up default as of r2
    "b2_dots": (2, 1, True, "dots_saveable"),
    "b1a4": (1, 4, False, None),
    "b1a8": (1, 8, False, None),
    "b1a4_dots": (1, 4, True, "dots_saveable"),
    "b1_noremat": (1, 1, False, None),      # r1 ceiling: 3.37 w/s single-chip
    "b2_noremat": (2, 1, False, None),      # r1: OOMs at scale_up by ~204 MB
    "b4_dots": (4, 1, True, "dots_saveable"),
}


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--variants", nargs="+", default=["shipped", "b2_dots", "b1a4", "b1a8"],
                   choices=sorted(VARIANTS))
    p.add_argument("--preset", default="scale_up")
    p.add_argument("--steps", type=int, default=4, help="macro steps per chunk")
    p.add_argument("--rounds", type=int, default=4)
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
    from tec_mollm_tpu.training.train_state import create_train_state, make_train_step

    if args.preset == "tiny":
        from tec_mollm_tpu.config import tiny_config

        base_cfg = tiny_config()
    else:
        base_cfg = PRESETS[args.preset]()
    m = base_cfg.model
    lat, lon = grid_coordinates(m.grid_h, m.grid_w)
    graph_np = build_graph(
        lat, lon, distance_threshold_km=base_cfg.data.distance_threshold_km
    )
    shifts, graph = graph_inputs(graph_np)
    dtype = jnp.bfloat16 if base_cfg.train.bf16 else jnp.float32

    max_macro = max(
        VARIANTS[name][0] * VARIANTS[name][1] for name in args.variants
    )
    split = synthetic_processed_split(
        num_windows=max_macro + 1, L_in=base_cfg.train.L_in,
        L_out=base_cfg.train.L_out, num_nodes=m.num_nodes, seed=0,
    )
    ds = SlidingWindowDataset(split, base_cfg.train.L_in, base_cfg.train.L_out)

    # Build per-variant SETUP thunks. Variants are NOT co-resident: at
    # scale_up shapes two train states cannot share one v5e HBM (first attempt
    # OOMed exactly that way), so each timing round creates the variant's
    # state, warms one step, times, then frees the state before the next
    # variant. Interleaving across rounds keeps the ambient-load fairness;
    # jit executables stay cached in-process so only round 0 pays compiles.
    setups = {}
    macros = {}
    failed = set()
    for name in args.variants:
        bsz, accum, remat, policy = VARIANTS[name]
        cfg = dataclasses.replace(
            base_cfg,
            train=dataclasses.replace(
                base_cfg.train, batch_size=bsz, accumulation_steps=accum,
                remat_llm=remat, remat_policy=policy,
            ),
        )
        macro = bsz * accum
        batch_np = ds.gather_batch(np.arange(macro) % max(len(ds), 1))
        model = TECMoLLM(
            m, dtype=dtype, remat_llm=remat, remat_policy=policy,
            stencil_shifts=shifts,
        )
        step_fn_box = {}

        def setup(model=model, cfg=cfg, batch_np=batch_np, box=step_fn_box):
            state, tx, _ = create_train_state(
                model, cfg, jax.random.key(0, impl=cfg.train.prng_impl),
                batch_np, graph, frozen_dtype=dtype if cfg.train.bf16 else None,
            )
            if "fn" not in box:
                box["fn"] = jax.jit(make_train_step(model, cfg, tx), donate_argnums=0)
            batch = jax.tree.map(jnp.asarray, batch_np)
            holder = {"s": state}

            def run():
                holder["s"], metrics = box["fn"](holder["s"], batch, graph)
                return metrics["loss"]

            return run

        setups[name] = setup
        macros[name] = macro

    best = {name: float("inf") for name in setups}
    for r in range(args.rounds):
        for name, setup in setups.items():
            if name in failed:
                continue
            run = None
            try:
                run = setup()
                out = run()          # warmup (round 0: compile)
                float(out)
                t0 = time.perf_counter()
                for _ in range(args.steps):
                    out = run()
                float(out)
                dt = (time.perf_counter() - t0) / args.steps
                best[name] = min(best[name], dt)
            except Exception as e:  # noqa: BLE001 — OOM/compile failures drop out
                failed.add(name)
                print(json.dumps({"variant": name, "error": str(e)[:200]}), flush=True)
            finally:
                # drop the closure (and the train state it holds) even on
                # failure — a leaked state co-resident with the NEXT variant's
                # is exactly the OOM this one-at-a-time loop exists to avoid
                del run
        # the per-round progress line follows the same policy as the final
        # report: a variant that has failed reports no throughput, even from
        # an earlier successful round
        alive = {
            k: v for k, v in best.items() if v < float("inf") and k not in failed
        }
        print(
            json.dumps(
                {"round": r, **{k: round(macros[k] / v, 3) for k, v in alive.items()}}
            ),
            flush=True,
        )

    # a variant that failed in ANY round is not reported as a throughput even
    # if an earlier round succeeded: "it ran once but cannot run reliably" is
    # exactly the ambiguity an A/B record must not carry
    alive = {
        k: v for k, v in best.items() if v < float("inf") and k not in failed
    }
    result = {
        "preset": args.preset,
        "ms_per_macro_step": {k: round(v * 1e3, 1) for k, v in alive.items()},
        "windows_per_sec": {k: round(macros[k] / v, 3) for k, v in alive.items()},
        "failed": sorted(failed),
    }
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    sys.exit(main())
