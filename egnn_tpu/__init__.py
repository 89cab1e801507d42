"""egnn_tpu — TPU-native E(n)-equivariant graph neural networks.

A from-scratch JAX/XLA/Pallas framework with the capability surface of the
reference egnn-pytorch library (E(n)-Equivariant Graph Neural Networks,
Satorras, Hoogeboom, Welling 2021, arXiv:2102.09844): dense batched-tensor
path and sparse/COO path, kNN and adjacency-restricted neighborhoods, global
induced-token attention, plus TPU-first extras the reference lacks —
mesh-sharded data/graph parallelism, Pallas kernels for the pairwise hot
loops, optax/orbax training utilities.
"""

from .models.attention import Attention, GlobalLinearAttention
from .models.egnn import EGNN, EGNNNetwork
from .models.egnn_sparse import (
    AttentionSparse,
    EGNNSparse,
    EGNNSparseNetwork,
    GlobalLinearAttentionSparse,
)

# Reference-style aliases (egnn_pytorch/__init__.py exports these four names).
EGNN_Network = EGNNNetwork
EGNN_Sparse = EGNNSparse
EGNN_Sparse_Network = EGNNSparseNetwork

__version__ = "0.1.0"

__all__ = [
    "EGNN",
    "EGNNNetwork",
    "EGNN_Network",
    "Attention",
    "GlobalLinearAttention",
    "AttentionSparse",
    "EGNNSparse",
    "EGNN_Sparse",
    "EGNNSparseNetwork",
    "EGNN_Sparse_Network",
    "GlobalLinearAttentionSparse",
]
