"""Pallas TPU kernels for the EGNN hot ops.

Each kernel has a jnp reference implementation living next to it (used as the
CPU fallback and as the ground truth for ``interpret=True`` tests). Dispatch
helpers pick the kernel on TPU backends and the jnp path elsewhere.

Kernels (SURVEY.md §7 stage 5):
- ``knn.knn_select_pallas``      — fused pairwise distance + masked ranking +
                                   streaming top-k (reference hot ops at
                                   egnn_pytorch.py:232-268 — the O(n^2) part).
- ``fused_message.egnn_message_aggregate`` — fused all-pairs message MLP +
                                   coordinate/feature aggregation (dense no-kNN
                                   path, egnn_pytorch.py:282-341).
- ``segment.segment_sum_pallas`` — destination-sorted COO segment reduction
                                   (torch-scatter replacement).
"""
from .knn import knn_select_pallas, supports_pallas_knn

__all__ = ["knn_select_pallas", "supports_pallas_knn"]
