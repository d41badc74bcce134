"""Config preset tests (BASELINE.json configs 3-5): derived shapes + abstract
forward (eval_shape — no FLOPs, catches wiring errors at full size)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tec_mollm_tpu.config import PRESETS, long_horizon_config, scale_up_config, scaled_backbone_config
from tec_mollm_tpu.models import TECMoLLM


class TestPresets:
    def test_scale_up_derived(self):
        cfg = scale_up_config()
        assert cfg.model.conv_output_len == 84
        assert cfg.model.num_patches == 21
        assert cfg.model.llm_layers == 6
        assert cfg.model.head_input_dim == 768 * 21
        # r3 A/B (BASELINE.md): B=1 x accum 8 no-remat beats B=2 + full remat
        # by +29.5% at the same effective batch 8/replica
        assert cfg.train.batch_size * cfg.train.accumulation_steps == 8
        assert cfg.train.remat_llm is False

    def test_long_horizon_derived(self):
        cfg = long_horizon_config()
        assert cfg.model.temporal_seq_len == 96
        assert cfg.model.prediction_horizon == 24
        assert cfg.model.num_patches == 6
        assert cfg.data.distance_threshold_km == 300.0

    def test_long_horizon_graph_denser(self):
        from tec_mollm_tpu.data.synthetic import grid_coordinates
        from tec_mollm_tpu.graph import build_graph

        lat, lon = grid_coordinates(9, 11)
        g150 = build_graph(lat, lon, distance_threshold_km=150.0)
        g300 = build_graph(lat, lon, distance_threshold_km=300.0)
        assert g300.edge_index.shape[1] > 1.8 * g150.edge_index.shape[1]
        assert g300.has_stencil and len(g300.stencil_shifts) > len(g150.stencil_shifts)

    def test_operational_derived(self):
        from tec_mollm_tpu.config import operational_config

        cfg = operational_config()
        # the round-3-proven shift bundle (BASELINE.md): revin + quantile bands
        # + stride-1 learning regime + tail-val model selection
        assert cfg.model.revin is True
        assert cfg.model.quantiles == (0.1, 0.5, 0.9)
        assert cfg.model.median_index == 1
        assert cfg.train.train_stride == 1
        assert cfg.train.val_tail_frac == 0.3

    def test_scaled_backbone_derived(self):
        cfg = scaled_backbone_config()
        assert cfg.model.d_llm == 1024
        assert cfg.model.llm_heads == 16
        assert cfg.model.d_llm % cfg.model.llm_heads == 0

    @pytest.mark.parametrize("name", list(PRESETS))
    def test_abstract_forward(self, name):
        """Full-size abstract init+apply: catches shape wiring errors without FLOPs."""
        cfg = PRESETS[name]()
        m = cfg.model
        model = TECMoLLM(m)
        x = jnp.zeros((1, m.temporal_seq_len, m.num_nodes, m.in_features))
        tf = jnp.zeros((1, m.temporal_seq_len, 4), jnp.int32)
        nbrs = jnp.zeros((m.num_nodes, 12), jnp.int32)
        mask = jnp.ones((m.num_nodes, 12), bool)

        def full(x, tf, nbrs, mask):
            params = model.init(jax.random.key(0), x, tf, nbrs, mask)
            return model.apply(params, x, tf, nbrs, mask)

        out = jax.eval_shape(full, x, tf, nbrs, mask)
        # num_outputs = 1 point forecast, or len(quantiles) levels (operational)
        assert out.shape == (1, m.prediction_horizon, m.num_nodes, m.num_outputs)
