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
# EGNN_Network additionally accepts the reference's **kwargs passthrough
# (egnn_pytorch.py:344,387: unknown kwargs forward to every EGNN layer) —
# `EGNN_Network(depth=3, dim=32, num_nearest_neighbors=8)` works as-is,
# equivalent to EGNNNetwork(..., layer_kwargs=dict(num_nearest_neighbors=8)).
def EGNN_Network(**kwargs) -> EGNNNetwork:
    import dataclasses

    fields = {f.name for f in dataclasses.fields(EGNNNetwork)}
    layer_kwargs = dict(kwargs.pop("layer_kwargs", None) or {})
    extra = {k: kwargs.pop(k) for k in list(kwargs) if k not in fields}
    return EGNNNetwork(**kwargs, layer_kwargs={**extra, **layer_kwargs})


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
