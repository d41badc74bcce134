"""Per-stage time attribution for the flagship train step (VERDICT r1 weak #5).

Times each model stage (embedding, spatial GAT, temporal convs, GPT-2 backbone,
head) forward and forward+backward IN ISOLATION with its own jit, plus the full
train/eval step and the bare optimizer update, at the flagship config. Isolated
stages don't add up exactly to the fused step (XLA fuses across boundaries), but
they attribute where the ~185 ms goes well enough to pick optimization targets.

Timing: hard host-readback sync (CLAUDE.md rule 1); report min over chunks.
Run serialized on the TPU:  python scripts/profile_stages.py [--batch-size 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, args, steps=5, chunks=3, sync=None):
    out = fn(*args)  # compile
    (sync or (lambda o: float(np.asarray(o).ravel()[0])))(out)
    best = float("inf")
    for _ in range(chunks):
        t0 = time.perf_counter()
        for _ in range(steps):
            out = fn(*args)
        (sync or (lambda o: float(np.asarray(o).ravel()[0])))(out)
        best = min(best, (time.perf_counter() - t0) / steps)
    return best * 1e3  # ms


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--steps", type=int, default=5)
    p.add_argument("--chunks", type=int, default=3)
    p.add_argument("--preset", default="default")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--only", nargs="*", default=None,
                   help="only run stages whose name contains one of these; full steps/optimizer skipped unless named")
    args = p.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from tec_mollm_tpu.config import PRESETS, tiny_config

    presets = dict(PRESETS, tiny=tiny_config)
    from tec_mollm_tpu.data.dataset import SlidingWindowDataset
    from tec_mollm_tpu.data.synthetic import grid_coordinates, synthetic_processed_split
    from tec_mollm_tpu.graph import build_graph
    from tec_mollm_tpu.models import TECMoLLM
    from tec_mollm_tpu.models.embeddings import SpatioTemporalEmbedding
    from tec_mollm_tpu.models.gat import SpatialEncoder
    from tec_mollm_tpu.models.gpt2 import GPT2Backbone
    from tec_mollm_tpu.models.head import PredictionHead
    from tec_mollm_tpu.models.tec_mollm import graph_inputs
    from tec_mollm_tpu.models.temporal import TemporalEncoder
    from tec_mollm_tpu.training.train_state import (
        create_train_state,
        make_eval_step,
        make_train_step,
    )

    import dataclasses

    cfg = presets[args.preset]()
    cfg = dataclasses.replace(
        cfg,
        train=dataclasses.replace(
            cfg.train, batch_size=args.batch_size, accumulation_steps=1
        ),
    )
    m = cfg.model
    B, L, N = args.batch_size, cfg.train.L_in, m.num_nodes
    dtype = jnp.bfloat16 if cfg.train.bf16 else jnp.float32
    rng = np.random.default_rng(0)
    results = {}

    def report(name, ms):
        results[name] = round(ms, 2)
        print(json.dumps({"stage": name, "ms": round(ms, 3)}), flush=True)

    lat, lon = grid_coordinates(m.grid_h, m.grid_w)
    graph_np = build_graph(lat, lon, distance_threshold_km=cfg.data.distance_threshold_km)
    shifts, graph = graph_inputs(graph_np)

    split = synthetic_processed_split(
        num_windows=B + 1, L_in=L, L_out=cfg.train.L_out, num_nodes=N, seed=0
    )
    ds = SlidingWindowDataset(split, L, cfg.train.L_out)
    batch_np = ds.gather_batch(np.arange(B) % max(len(ds), 1))
    batch = jax.tree.map(jnp.asarray, batch_np)

    def want(name):
        return not args.only or any(s_ in name for s_ in args.only)

    # ---- full steps ----
    model = TECMoLLM(m, dtype=dtype, remat_llm=cfg.train.remat_llm, stencil_shifts=shifts)
    state, tx, _ = create_train_state(
        model, cfg, jax.random.key(0, impl=cfg.train.prng_impl), batch_np, graph,
        frozen_dtype=dtype if cfg.train.bf16 else None,
    )
    train_step = jax.jit(make_train_step(model, cfg, tx))

    def sync_state(out):
        return float(out[1]["loss"])

    if want("train_step_total"):
        report("train_step_total", timed(
            train_step, (state, batch, graph), args.steps, args.chunks,
            sync=sync_state,
        ))

    merged = state.params
    eval_step = jax.jit(make_eval_step(model, cfg))

    def sync_eval(out):
        return float(out[0])

    if want("eval_fwd_total"):
        report("eval_fwd_total", timed(
            eval_step, (merged, batch, graph), args.steps, args.chunks,
            sync=sync_eval,
        ))

    # ---- optimizer update alone ----
    grads = jax.tree.map(lambda x: jnp.ones_like(x), state.trainable)

    @jax.jit
    def opt_only(opt_state, trainable, grads):
        import optax

        updates, new_opt = tx.update(grads, opt_state, trainable)
        new_t = optax.apply_updates(trainable, updates)
        return new_opt, new_t

    def sync_opt(out):
        leaf = jax.tree_util.tree_leaves(out[1])[0]
        return float(jnp.sum(leaf))

    if want("optimizer_update"):
        report("optimizer_update", timed(
            opt_only, (state.opt_state, state.trainable, grads),
            args.steps, args.chunks, sync=sync_opt,
        ))

    # ---- per-stage (isolated params, training mode where it matters) ----
    key = jax.random.key(0, impl=cfg.train.prng_impl)

    def stage(name, module, inputs, has_det_kwarg=False, training=False, grad=True):
        if args.only and not any(s in name for s in args.only):
            return
        init_kw = {"deterministic": True} if has_det_kwarg else {}
        params = module.init(key, *inputs, **init_kw)
        apply_kw = {"deterministic": not training} if has_det_kwarg else {}
        rngs = (
            {"dropout": jax.random.key(1, impl=cfg.train.prng_impl)}
            if (has_det_kwarg and training)
            else None
        )

        @jax.jit
        def fwd(p, *xs):
            if rngs is not None:
                return module.apply(p, *xs, rngs=rngs, **apply_kw)
            return module.apply(p, *xs, **apply_kw)

        def sync_arr(o):
            return float(jnp.sum(o.astype(jnp.float32)))

        report(f"{name}_fwd", timed(fwd, (params, *inputs), args.steps, args.chunks,
                                    sync=sync_arr))
        if not grad:  # e.g. the fwd-only Pallas eval kernel (no diff rule)
            return

        @jax.jit
        def fwd_bwd(p, *xs):
            def loss(p):
                if rngs is not None:
                    out = module.apply(p, *xs, rngs=rngs, **apply_kw)
                else:
                    out = module.apply(p, *xs, **apply_kw)
                return jnp.sum(out.astype(jnp.float32) ** 2)

            val, g = jax.value_and_grad(loss)(p)
            # keep the backward alive by RETURNING a grad reduction: returning
            # only `val` lets XLA dead-code-eliminate the entire gradient
            # computation (it did — first run of this script reported
            # fwd_bwd == fwd)
            gsum = sum(jnp.sum(leaf.astype(jnp.float32))
                       for leaf in jax.tree_util.tree_leaves(g))
            return val, gsum

        report(f"{name}_fwd_bwd", timed(
            fwd_bwd, (params, *inputs), args.steps, args.chunks,
            sync=lambda v: float(v[0]) + float(v[1]),
        ))

    x_in = jnp.asarray(rng.normal(size=(B, L, N, m.in_features)).astype(np.float32), dtype)
    tf = jnp.asarray(batch_np["time_features"])
    stage("embedding", SpatioTemporalEmbedding(m, dtype=dtype), (x_in, tf))

    h_sp = jnp.asarray(
        rng.normal(size=(B, L, N, m.spatial_in_channels)).astype(np.float32), dtype
    )
    stage(
        "spatial_gat_train", SpatialEncoder(m, dtype=dtype, stencil_shifts=shifts),
        (h_sp, graph[0], graph[1]), has_det_kwarg=True, training=True,
    )
    stage(
        "spatial_gat_eval",
        SpatialEncoder(m, dtype=dtype, stencil_shifts=shifts, gat_pallas=True),
        (h_sp, graph[0], graph[1]), has_det_kwarg=True, grad=False,
    )

    h_t = jnp.asarray(
        rng.normal(size=(B * N, L, m.spatial_in_channels)).astype(np.float32), dtype
    )
    # isolated stages must use the SHIPPED TECMoLLM defaults (fuse_branches off,
    # lean_ln on) or the per-stage numbers won't explain the full-step total
    stage("temporal_convs", TemporalEncoder(m, dtype=dtype, fuse_branches=False),
          (h_t,))

    h_llm = jnp.asarray(
        rng.normal(size=(B * N, m.num_patches, m.d_llm)).astype(np.float32), dtype
    )
    stage("gpt2_backbone_train", GPT2Backbone(m, dtype=dtype, lean_ln=True),
          (h_llm,), has_det_kwarg=True, training=True)
    stage("gpt2_backbone_eval", GPT2Backbone(m, dtype=dtype, lean_ln=True),
          (h_llm,), has_det_kwarg=True)
    stage("head", PredictionHead(m, dtype=dtype), (h_llm,),
          has_det_kwarg=True, training=True)

    print(json.dumps({"summary": results, "backend": jax.default_backend(),
                      "B": B, "preset": args.preset}), flush=True)


if __name__ == "__main__":
    sys.exit(main())
