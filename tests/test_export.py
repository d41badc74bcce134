"""AOT model export: StableHLO serialization roundtrip (serving/export.py).

The artifact must be self-contained (no model code / checkpoint at load),
match the in-process jitted forward, and (symbolic batch) serve any B."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tec_mollm_tpu.config import tiny_config
from tec_mollm_tpu.data.synthetic import grid_coordinates
from tec_mollm_tpu.graph import build_graph
from tec_mollm_tpu.models import TECMoLLM
from tec_mollm_tpu.models.tec_mollm import graph_inputs
from tec_mollm_tpu.serving.export import (
    export_forecaster,
    load_forecaster,
    save_exported,
)


@pytest.fixture(scope="module")
def setup(rng):
    cfg = tiny_config()
    # fp32 pipeline: bf16 fusion-order noise would force a ~0.06 tolerance,
    # which can't distinguish a faithful export from a subtly broken one
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, bf16=False)
    )
    m = cfg.model
    lat, lon = grid_coordinates(m.grid_h, m.grid_w)
    graph = build_graph(lat, lon)
    ss, (g1, g2) = graph_inputs(graph)
    model = TECMoLLM(m, dtype=jnp.float32, stencil_shifts=ss)
    x = rng.normal(size=(3, cfg.train.L_in, m.num_nodes, m.in_features)).astype(
        np.float32
    )
    tf = np.stack(
        [
            rng.integers(0, 12, (3, cfg.train.L_in)),
            rng.integers(0, 366, (3, cfg.train.L_in)),
            rng.integers(0, m.num_years, (3, cfg.train.L_in)),
            rng.integers(0, 4, (3, cfg.train.L_in)),
        ],
        -1,
    ).astype(np.int32)
    params = model.init(jax.random.key(0), jnp.asarray(x), jnp.asarray(tf), g1, g2)[
        "params"
    ]
    direct = jax.jit(
        lambda p, a, b: model.apply(
            {"params": p}, a, b, g1, g2, deterministic=True
        )
    )(params, jnp.asarray(x), jnp.asarray(tf))
    return cfg, graph, params, x, tf, np.asarray(direct)


class TestExportRoundtrip:
    def test_symbolic_batch_roundtrip(self, setup, tmp_path):
        cfg, graph, params, x, tf, direct = setup
        blob = export_forecaster(cfg, params, graph, platforms=("cpu",))
        path = str(tmp_path / "model.stablehlo")
        save_exported(blob, path, meta={"num_nodes": cfg.model.num_nodes})
        assert (tmp_path / "model.stablehlo.json").exists()

        fn = load_forecaster(path)
        out = np.asarray(fn(jnp.asarray(x), jnp.asarray(tf)))
        assert out.shape == (3, cfg.train.L_out, cfg.model.num_nodes, 1)
        np.testing.assert_allclose(out, direct, rtol=1e-5, atol=1e-5)

        # symbolic batch: the SAME artifact serves a different B
        out1 = np.asarray(fn(jnp.asarray(x[:1]), jnp.asarray(tf[:1])))
        np.testing.assert_allclose(out1, direct[:1], rtol=1e-5, atol=1e-5)

    def test_fixed_batch_export(self, setup, tmp_path):
        cfg, graph, params, x, tf, direct = setup
        blob = export_forecaster(
            cfg, params, graph, batch_size=3, platforms=("cpu",)
        )
        path = str(tmp_path / "fixed.stablehlo")
        save_exported(blob, path)
        fn = load_forecaster(path)
        out = np.asarray(fn(jnp.asarray(x), jnp.asarray(tf)))
        np.testing.assert_allclose(out, direct, rtol=1e-5, atol=1e-5)
        # a fixed-shape artifact must reject other batch sizes, not miscompute
        with pytest.raises(Exception):
            fn(jnp.asarray(x[:1]), jnp.asarray(tf[:1]))
