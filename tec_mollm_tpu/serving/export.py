"""Ahead-of-time model export: serialize the forecast function to StableHLO.

Beyond the reference surface (which can only run inference from Python with
the full model code + torch stack loaded, /root/reference/test.py:19-44) —
`jax.export` lowers the jitted forward to a versioned, self-contained
StableHLO artifact:

  * params and graph tables are baked in as constants — the artifact needs NO
    model code, NO checkpoint, NO config to run;
  * multi-platform lowering (TPU + CPU by default), so one artifact serves on
    a TPU pod and smoke-tests on a CPU box;
  * the batch dimension is symbolic when possible, with a fixed-size fallback
    (the compressed sequence pipeline reshapes (B,L,N,C) through B*N-batched
    stages, which symbolic-dimension arithmetic expresses fine in practice);
  * forward-compatibility is governed by jax.export's calling-convention
    versioning, not by this repo's import graph.

Artifact layout: `<path>` is the serialized Exported blob (bytes), with a
sibling `<path>.json` carrying human-readable metadata (shapes, platforms,
config summary) for ops tooling.

Usage:
    blob = export_forecaster(cfg, params, graph)          # bytes
    save_exported(blob, "model.stablehlo", meta={...})
    fn = load_forecaster("model.stablehlo")               # callable
    preds = fn(x, time_features)                          # (B, L_out, N, 1)
"""

from __future__ import annotations

import json
import os
from typing import Any, Callable

import numpy as np

from tec_mollm_tpu.config import Config
from tec_mollm_tpu.graph.builder import GraphData

import logging

logger = logging.getLogger(__name__)


def export_forecaster(
    cfg: Config,
    params: Any,
    graph: GraphData,
    batch_size: int | None = None,
    platforms: tuple[str, ...] = ("tpu", "cpu"),
) -> bytes:
    """Serialize the deterministic forecast forward to a StableHLO blob.

    batch_size=None exports a symbolic batch dimension (any B at call time);
    an int pins the batch (use when a symbolic reshape in a custom config
    fails to export). Returns the serialized bytes."""
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from tec_mollm_tpu.models import TECMoLLM
    from tec_mollm_tpu.models.tec_mollm import graph_inputs

    cfg = cfg.resolved()
    m = cfg.model
    stencil_shifts, (g1, g2) = graph_inputs(graph)
    model = TECMoLLM(
        m,
        dtype=jnp.bfloat16 if cfg.train.bf16 else jnp.float32,
        stencil_shifts=stencil_shifts,
    )
    # params/graph become baked-in constants of the exported computation: the
    # artifact is self-contained (no checkpoint or model code at load time)
    params = jax.device_get(params)
    g1, g2 = np.asarray(g1), np.asarray(g2)

    def forecast(x, time_features):
        return model.apply(
            {"params": params}, x, time_features, g1, g2, deterministic=True
        )

    if batch_size is None:
        (b,) = jexport.symbolic_shape("b")
    else:
        b = batch_size
    x_spec = jax.ShapeDtypeStruct(
        (b, cfg.train.L_in, m.num_nodes, m.in_features),
        jnp.bfloat16 if cfg.train.bf16 else jnp.float32,
    )
    tf_spec = jax.ShapeDtypeStruct((b, cfg.train.L_in, 4), jnp.int32)
    exported = jexport.export(jax.jit(forecast), platforms=list(platforms))(
        x_spec, tf_spec
    )
    return exported.serialize()


def save_exported(
    blob: bytes, path: str, meta: dict[str, Any] | None = None
) -> None:
    """Write the artifact plus a sibling .json metadata file (atomic renames).

    Metadata first: artifact-present must imply metadata-present, or a crash
    between the writes leaves a servable blob whose config/dtype cross-checks
    silently don't run."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    if meta is not None:
        mtmp = path + ".json.tmp"
        with open(mtmp, "w") as f:
            json.dump(meta, f, indent=2)
        os.replace(mtmp, path + ".json")
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)
    logger.info("exported %d bytes -> %s", len(blob), path)


def load_forecaster(path: str) -> Callable[..., Any]:
    """Deserialize an artifact into a callable (x, time_features) -> preds.

    Needs only jax at load time — no model code, checkpoint, or config."""
    from jax import export as jexport

    with open(path, "rb") as f:
        exported = jexport.deserialize(f.read())
    return exported.call
