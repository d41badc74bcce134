"""Autoregressive rollout tests on the tiny config."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tec_mollm_tpu.config import tiny_config
from tec_mollm_tpu.data.scaler import StandardScaler
from tec_mollm_tpu.evaluation.rollout import (
    autoregressive_rollout,
    target_to_feature_affine,
)
from tec_mollm_tpu.models import TECMoLLM
from tec_mollm_tpu.models.tec_mollm import graph_inputs


@pytest.fixture(scope="module")
def setup(tiny_graph):
    import dataclasses

    cfg = tiny_config()
    cfg = dataclasses.replace(cfg, train=dataclasses.replace(cfg.train, bf16=False))
    m = cfg.model
    rng = np.random.default_rng(0)
    b = 2
    stencil_shifts, (g1, g2) = graph_inputs(tiny_graph)
    model = TECMoLLM(m, dtype=jnp.float32, stencil_shifts=stencil_shifts)
    x = rng.normal(size=(b, m.temporal_seq_len, m.num_nodes, m.in_features)).astype(np.float32)
    tf = rng.integers(0, 4, size=(b, m.temporal_seq_len + 3 * m.prediction_horizon, 4)).astype(np.int32)
    sw = rng.normal(size=(b, 3 * m.prediction_horizon, 5)).astype(np.float32)
    params = model.init(
        jax.random.key(0), jnp.asarray(x), jnp.asarray(tf[:, : m.temporal_seq_len]),
        g1, g2,
    )["params"]
    return cfg, tiny_graph, params, model, (g1, g2), x, tf, sw


class TestRollout:
    def test_shapes_and_finiteness(self, setup):
        cfg, graph, params, *_ , x, tf, sw = setup
        L_out = cfg.model.prediction_horizon
        out = autoregressive_rollout(cfg, params, graph, x, tf, sw, num_steps=3 * L_out)
        b, n = x.shape[0], x.shape[2]
        assert out.shape == (b, 3 * L_out, n, 1)
        assert np.all(np.isfinite(out))

    def test_first_chunk_equals_direct_predict(self, setup):
        cfg, graph, params, model, (g1, g2), x, tf, sw = setup
        L_in, L_out = cfg.model.temporal_seq_len, cfg.model.prediction_horizon
        out = autoregressive_rollout(cfg, params, graph, x, tf, sw, num_steps=L_out)
        direct = model.apply(
            {"params": params}, jnp.asarray(x), jnp.asarray(tf[:, :L_in]), g1, g2,
            deterministic=True,
        )
        np.testing.assert_allclose(out, np.asarray(direct), atol=1e-5)

    def test_non_multiple_steps_truncated(self, setup):
        cfg, graph, params, *_ , x, tf, sw = setup
        L_out = cfg.model.prediction_horizon
        out = autoregressive_rollout(cfg, params, graph, x, tf, sw, num_steps=L_out + 1)
        assert out.shape[1] == L_out + 1

    def test_too_short_exogenous_raises(self, setup):
        cfg, graph, params, *_ , x, tf, sw = setup
        with pytest.raises(ValueError, match="time features"):
            autoregressive_rollout(
                cfg, params, graph, x, tf[:, :-5], sw,
                num_steps=3 * cfg.model.prediction_horizon,
            )

    def test_affine_conversion(self):
        fs = StandardScaler(mean=np.array([10.0, 0.0]), scale=np.array([4.0, 1.0]))
        ts = StandardScaler(mean=np.array([12.0]), scale=np.array([2.0]))
        a, b = target_to_feature_affine(fs, ts)
        # physical = y*2 + 12 ; feature = (physical - 10)/4
        y = 1.5
        np.testing.assert_allclose(a * y + b, ((y * 2 + 12) - 10) / 4)
