"""Stencil GAT tests: offset decomposition correctness + exact equivalence with the
padded-gather GATv2 (same parameters)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tec_mollm_tpu.config import tiny_config
from tec_mollm_tpu.data.synthetic import grid_coordinates
from tec_mollm_tpu.graph import build_graph
from tec_mollm_tpu.graph.builder import build_grid_stencil
from tec_mollm_tpu.models.gat import GATv2, GATv2Stencil, SpatialEncoder


class TestStencilConstruction:
    @pytest.mark.parametrize("grid", [(5, 7), (41, 71)])
    def test_stencil_equals_padded_table(self, grid):
        """For every node, {n + shift : valid} must equal the padded neighbor set."""
        lat, lon = grid_coordinates(*grid)
        g = build_graph(lat, lon)
        shifts, valid = g.stencil_shifts, g.stencil_valid
        n = g.num_nodes
        node_ids = np.arange(n)
        stencil_sets = [set() for _ in range(n)]
        for o, k in enumerate(shifts):
            for node in node_ids[valid[o]]:
                stencil_sets[node].add(int(node + k))
        for i in range(n):
            table = set(g.neighbors[i][g.neighbor_mask[i]].tolist())
            assert stencil_sets[i] == table, f"node {i}"

    def test_self_loop_always_valid(self):
        lat, lon = grid_coordinates(5, 7)
        shifts, valid = build_grid_stencil(lat, lon)
        zero = list(shifts).index(0)
        assert valid[zero].all()


class TestStencilGAT:
    def _setup(self, grid=(6, 8), batch_shape=(2, 3), f=22, heads=2, c=11, seed=0):
        lat, lon = grid_coordinates(*grid)
        g = build_graph(lat, lon)
        rng = np.random.default_rng(seed)
        x = jnp.asarray(
            rng.normal(size=batch_shape + (g.num_nodes, f)).astype(np.float32)
        )
        return g, x

    def test_matches_padded_gat(self):
        g, x = self._setup()
        padded = GATv2(out_channels=11, heads=2)
        params = padded.init(
            jax.random.key(0), x, jnp.asarray(g.neighbors), jnp.asarray(g.neighbor_mask)
        )
        expect = padded.apply(
            params, x, jnp.asarray(g.neighbors), jnp.asarray(g.neighbor_mask)
        )
        stencil = GATv2Stencil(out_channels=11, heads=2)
        got = stencil.apply(
            params, x, tuple(int(s) for s in g.stencil_shifts),
            jnp.asarray(g.stencil_valid),
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(expect), atol=3e-5)

    def test_spatial_encoder_modes_agree(self):
        g, x = self._setup()
        cfg = tiny_config().model
        enc_pad = SpatialEncoder(cfg)
        params = enc_pad.init(
            jax.random.key(1), x, jnp.asarray(g.neighbors), jnp.asarray(g.neighbor_mask)
        )
        out_pad = enc_pad.apply(
            params, x, jnp.asarray(g.neighbors), jnp.asarray(g.neighbor_mask)
        )
        enc_st = SpatialEncoder(
            cfg, stencil_shifts=tuple(int(s) for s in g.stencil_shifts)
        )
        out_st = enc_st.apply(
            params, x, jnp.asarray(g.stencil_valid), jnp.asarray(g.stencil_valid)
        )
        np.testing.assert_allclose(np.asarray(out_st), np.asarray(out_pad), atol=3e-5)

    def test_full_grid_equivalence_spot(self):
        """41x71 full-size grid, single slice, fp32: modes agree."""
        g, x = self._setup(grid=(41, 71), batch_shape=(1,))
        mod_p = GATv2(out_channels=11, heads=2)
        params = mod_p.init(
            jax.random.key(2), x, jnp.asarray(g.neighbors), jnp.asarray(g.neighbor_mask)
        )
        out_p = mod_p.apply(
            params, x, jnp.asarray(g.neighbors), jnp.asarray(g.neighbor_mask)
        )
        mod_s = GATv2Stencil(out_channels=11, heads=2)
        out_s = mod_s.apply(
            params, x, tuple(int(s) for s in g.stencil_shifts),
            jnp.asarray(g.stencil_valid),
        )
        np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_p), atol=5e-5)
