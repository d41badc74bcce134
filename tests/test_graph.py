"""Graph construction tests, porting the reference's inline asserts
(graph_constructor.py:151-228) plus padded-neighbor-table invariants."""

import numpy as np
import pytest

from tec_mollm_tpu.data.synthetic import grid_coordinates
from tec_mollm_tpu.graph import (
    GraphData,
    build_graph,
    build_padded_neighbors,
    construct_binary_adjacency,
    haversine_distance_matrix,
    symmetrically_normalize,
)


@pytest.fixture(scope="module")
def small_grid():
    return grid_coordinates(5, 7)


class TestDistanceMatrix:
    def test_shape_symmetry_diagonal(self, small_grid):
        lat, lon = small_grid
        d = haversine_distance_matrix(lat, lon)
        n = 35
        assert d.shape == (n, n)
        np.testing.assert_allclose(d, d.T, atol=1e-9)
        np.testing.assert_allclose(np.diag(d), 0.0, atol=1e-9)

    def test_matches_sklearn_haversine(self, small_grid):
        """First-party haversine vs the sklearn call the reference uses
        (graph_constructor.py:56)."""
        from sklearn.metrics.pairwise import haversine_distances

        lat, lon = small_grid
        d_ours = haversine_distance_matrix(lat, lon, earth_radius_km=6371.0)
        lon_g, lat_g = np.meshgrid(lon, lat)
        coords = np.radians(np.vstack([lat_g.ravel(), lon_g.ravel()]).T)
        d_sk = haversine_distances(coords) * 6371.0
        np.testing.assert_allclose(d_ours, d_sk, atol=1e-6)

    def test_known_distance(self):
        # 1 degree of latitude ~= 111.19 km at R=6371
        d = haversine_distance_matrix(np.array([0.0, 1.0]), np.array([0.0]))
        np.testing.assert_allclose(d[0, 1], 6371.0 * np.pi / 180.0, rtol=1e-6)


class TestAdjacency:
    def test_binary_no_self_loops(self, small_grid):
        lat, lon = small_grid
        d = haversine_distance_matrix(lat, lon)
        adj = construct_binary_adjacency(d, 150.0)
        assert set(np.unique(adj)) <= {0, 1}
        assert np.all(np.diag(adj) == 0)
        np.testing.assert_array_equal(adj, adj.T)

    def test_normalization(self, small_grid):
        lat, lon = small_grid
        d = haversine_distance_matrix(lat, lon)
        adj = construct_binary_adjacency(d, 150.0)
        norm = symmetrically_normalize(adj)
        np.testing.assert_allclose(norm, norm.T, atol=1e-12)
        assert norm.min() >= 0 and norm.max() <= 1
        # spot check: norm[i,j] = 1/sqrt(deg_i * deg_j) where adjacent
        deg = adj.sum(1)
        i, j = np.argwhere(adj)[0]
        np.testing.assert_allclose(norm[i, j], 1.0 / np.sqrt(deg[i] * deg[j]))

    def test_isolated_node_guard(self):
        adj = np.zeros((3, 3), dtype=np.int64)
        adj[0, 1] = adj[1, 0] = 1
        norm = symmetrically_normalize(adj)
        assert np.all(np.isfinite(norm))
        assert norm[2].sum() == 0


class TestPaddedNeighbors:
    def test_table_consistent_with_coo(self, small_grid):
        lat, lon = small_grid
        g = build_graph(lat, lon, distance_threshold_km=150.0)
        n = g.num_nodes
        src, dst = g.edge_index
        # every COO edge appears exactly once in the padded table
        for i in range(n):
            expect = sorted(src[dst == i].tolist() + [i])  # + self loop
            got = sorted(g.neighbors[i][g.neighbor_mask[i]].tolist())
            assert got == expect
        # padded slots point at self and are masked
        assert np.all(g.neighbors[~g.neighbor_mask] == np.nonzero(~g.neighbor_mask)[0])
        # weights zero where masked
        assert np.all(g.neighbor_weight[~g.neighbor_mask] == 0)

    def test_degree_uniform_grid(self, small_grid):
        """On a 1-degree grid at low-mid latitude, 150 km reaches the 4-neighborhood
        plus diagonals at higher latitudes; every interior node has the same degree
        pattern per latitude row."""
        lat, lon = small_grid
        g = build_graph(lat, lon)
        deg = g.neighbor_mask.sum(1)
        assert deg.min() >= 3  # >= 2 grid neighbors + self
        assert g.max_degree <= 16

    def test_pad_to_multiple(self, small_grid):
        lat, lon = small_grid
        g = build_graph(lat, lon, pad_to_multiple=8)
        assert g.max_degree % 8 == 0

    def test_save_load(self, small_grid, tmp_path):
        lat, lon = small_grid
        g = build_graph(lat, lon)
        path = str(tmp_path / "graph.npz")
        g.save(path)
        g2 = GraphData.load(path)
        np.testing.assert_array_equal(g.edge_index, g2.edge_index)
        np.testing.assert_array_equal(g.neighbors, g2.neighbors)
        assert g2.num_nodes == g.num_nodes

    def test_full_grid_stats(self):
        """The real 41x71 grid: 2911 nodes; padded degree stays small (SURVEY §7)."""
        lat, lon = grid_coordinates(41, 71)
        g = build_graph(lat, lon)
        assert g.num_nodes == 2911
        assert g.edge_index.shape[1] > 2911 * 2  # connected beyond a path graph
        assert g.max_degree <= 24
