"""Pallas TPU kernels for the EGNN hot ops.

Each kernel has a jnp reference implementation living next to it (used as the
CPU fallback and as the ground truth for ``interpret=True`` tests). Dispatch
helpers pick the kernel on TPU backends and the jnp path elsewhere; each
kernel docstring records its MEASURED win/loss against the XLA equivalent.

Kernels (SURVEY.md §7 stage 5):
- ``knn.knn_select_pallas``        — fused pairwise distance + masked ranking
                                     + top-k selection (4-20x vs XLA).
- ``knn.knn_select_pallas_tiled``  — j-tiled running-top-k variant for any n
                                     (40x vs XLA at n=16k; no (n,n) in HBM).
- ``segment.segment_sum_pallas``   — order-blind one-hot MXU segment-sum
                                     (~2x vs XLA scatter at <=2048 segments).
- ``knn_layer.fused_knn_messages`` — fully fused kNN pair pipeline with a
                                     hand-written backward; opt-in only (the
                                     XLA gather pipeline measured faster at
                                     typical sizes).
- ``grid_knn.grid_knn_select_pallas`` — grid-blocked spatial selection:
                                     cell-shared candidate bands with an
                                     exactness certificate; the structural
                                     lever past the quadratic kernels' VPU
                                     floor at n >= 8192 (resident-table and
                                     streamed variants).
"""
from .grid_knn import grid_knn_select_pallas, supports_grid_knn
from .knn import (knn_select_pallas, knn_select_pallas_tiled,
                  supports_pallas_knn, supports_pallas_knn_shapes,
                  supports_pallas_knn_tiled)
from .knn_layer import fused_knn_messages, supports_fused_knn_layer
from .segment import segment_sum_pallas, supports_pallas_segment_sum

__all__ = [
    "knn_select_pallas",
    "grid_knn_select_pallas",
    "supports_grid_knn",
    "knn_select_pallas_tiled",
    "supports_pallas_knn_tiled",
    "supports_pallas_knn",
    "supports_pallas_knn_shapes",
    "fused_knn_messages",
    "supports_fused_knn_layer",
    "segment_sum_pallas",
    "supports_pallas_segment_sum",
]
