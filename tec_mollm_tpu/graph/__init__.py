from tec_mollm_tpu.graph.builder import (
    GraphData,
    build_graph,
    build_padded_neighbors,
    construct_binary_adjacency,
    haversine_distance_matrix,
    symmetrically_normalize,
)

__all__ = [
    "GraphData",
    "build_graph",
    "build_padded_neighbors",
    "construct_binary_adjacency",
    "haversine_distance_matrix",
    "symmetrically_normalize",
]
