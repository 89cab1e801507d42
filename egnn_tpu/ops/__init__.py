from .core import (
    batched_index_select,
    coors_norm,
    embed_tokens,
    exists,
    fourier_encode_dist,
    layer_norm,
    safe_div,
)
from .neighbors import (
    Neighborhood,
    expand_adjacency_degrees,
    knn_ranking,
    max_degree,
    pairwise_geometry,
    select_neighborhood,
)
from .graph import (
    EdgeSet,
    backbone_covalent_bonds,
    chain_adjacency,
    edges_from_dense_adj,
    knn_graph,
    radius_graph,
)
from .neighbors import knn_select
from .pairwise_stream import PairwiseParams, pairwise_block, streamed_pairwise
from .segment import (
    graph_layer_norm,
    segment_aggregate,
    segment_max,
    segment_mean,
    segment_softmax,
    segment_sum,
)

__all__ = [
    "batched_index_select",
    "coors_norm",
    "embed_tokens",
    "exists",
    "fourier_encode_dist",
    "layer_norm",
    "safe_div",
    "Neighborhood",
    "expand_adjacency_degrees",
    "knn_ranking",
    "max_degree",
    "pairwise_geometry",
    "select_neighborhood",
    "knn_select",
    "EdgeSet",
    "backbone_covalent_bonds",
    "chain_adjacency",
    "edges_from_dense_adj",
    "knn_graph",
    "radius_graph",
    "PairwiseParams",
    "pairwise_block",
    "streamed_pairwise",
    "graph_layer_norm",
    "segment_aggregate",
    "segment_max",
    "segment_mean",
    "segment_softmax",
    "segment_sum",
]
