"""TPU parity check: fused short-T attention kernel vs the XLA unrolled path.

Deterministic (dropout-off) forward of the FULL flagship model must agree
between fused_attn=True and False on identical params; also checks train-step
gradients with dropout DISABLED (llm_dropout=0) since the kernel's dropout
stream is intentionally different from flax's. Run serialized on the TPU:

    python scripts/check_fused_attn_parity.py
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
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
        make_loss_fn,
    )

    cfg = PRESETS["default"]()
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, batch_size=2, accumulation_steps=1)
    )
    m = cfg.model
    lat, lon = grid_coordinates(m.grid_h, m.grid_w)
    graph_np = build_graph(lat, lon, distance_threshold_km=cfg.data.distance_threshold_km)
    shifts, graph = graph_inputs(graph_np)
    split = synthetic_processed_split(
        num_windows=3, L_in=cfg.train.L_in, L_out=cfg.train.L_out,
        num_nodes=m.num_nodes, seed=0,
    )
    ds = SlidingWindowDataset(split, cfg.train.L_in, cfg.train.L_out)
    batch_np = ds.gather_batch(np.arange(2))
    batch = jax.tree.map(jnp.asarray, batch_np)

    models = {
        name: TECMoLLM(
            m, dtype=jnp.bfloat16, stencil_shifts=shifts, fused_attn=fused
        )
        for name, fused in (("xla", False), ("fused", True))
    }
    state, _, _ = create_train_state(
        models["xla"], cfg, jax.random.key(0, impl=cfg.train.prng_impl), batch_np,
        graph, frozen_dtype=jnp.bfloat16,
    )
    params = state.params

    # 1) deterministic forward parity (bit-level question: fp32 softmax both
    # sides, bf16 elsewhere -> tolerances at bf16 resolution)
    outs = {}
    for name, model in models.items():
        fn = jax.jit(make_eval_step(model, cfg))
        loss, preds, _ = fn(params, batch, graph)
        outs[name] = (float(loss), np.asarray(preds, dtype=np.float32))
    max_abs = float(np.abs(outs["xla"][1] - outs["fused"][1]).max())
    print(json.dumps({"fwd_loss_xla": outs["xla"][0],
                      "fwd_loss_fused": outs["fused"][0],
                      "fwd_pred_max_abs_diff": max_abs}))

    # 2) gradient parity with dropout disabled everywhere
    cfg_nd = dataclasses.replace(
        cfg, model=dataclasses.replace(
            m, llm_dropout=0.0, lora_dropout=0.0, gat_dropout=0.0,
            post_llm_dropout=0.0, head_dropout=0.0,
        )
    )
    grads = {}
    for name, fused in (("xla", False), ("fused", True)):
        model = TECMoLLM(
            cfg_nd.model, dtype=jnp.bfloat16, stencil_shifts=shifts,
            fused_attn=fused,
        )
        loss_fn = make_loss_fn(model, cfg_nd)
        gfn = jax.jit(jax.value_and_grad(loss_fn, argnums=0))
        loss, g = gfn(state.trainable, state.frozen, batch, graph,
                      jax.random.key(1, impl=cfg.train.prng_impl))
        grads[name] = (float(loss), jax.device_get(g))
    leaves_a = jax.tree.leaves(grads["xla"][1])
    leaves_b = jax.tree.leaves(grads["fused"][1])
    rel = max(
        float(np.abs(a - b).max() / (np.abs(a).max() + 1e-12))
        for a, b in zip(leaves_a, leaves_b)
    )
    print(json.dumps({"grad_loss_xla": grads["xla"][0],
                      "grad_loss_fused": grads["fused"][0],
                      "grad_max_rel_diff": rel}))


if __name__ == "__main__":
    main()
