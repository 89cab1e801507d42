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
    "graph_layer_norm",
    "segment_aggregate",
    "segment_max",
    "segment_mean",
    "segment_softmax",
    "segment_sum",
]
