"""Device-mesh helpers.

The reference has no distributed machinery at all (SURVEY.md §2c: no
torch.distributed anywhere; single GPU via .cuda(), denoise_sparse.py:32).
Here the communication backend is the JAX runtime itself: a Mesh + NamedSharding
drives XLA to insert psum/all-gather/ppermute collectives over ICI/DCN.

Axes:
- ``data``  — batch / graph-set sharding (DP). Gradients psum over it.
- ``graph`` — node-dimension sharding (the GNN analog of sequence/context
  parallelism): each device owns a contiguous i-shard of nodes; pairwise
  interactions against the full j-dimension are resolved by XLA-inserted
  all-gathers of the (small) coordinate tensor over ICI.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    data: int = 1,
    graph: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (data, graph) mesh. ``data*graph`` must equal device count.

    Axis order puts ``data`` outermost so cross-host (DCN) traffic carries only
    gradient psums while the chattier node-dimension collectives ride ICI.
    """
    devices = list(devices if devices is not None else jax.devices())
    if data * graph != len(devices):
        raise ValueError(
            f"mesh size data*graph={data * graph} != device count {len(devices)}"
        )
    dev_array = np.asarray(devices).reshape(data, graph)
    return Mesh(dev_array, axis_names=("data", "graph"))


def dense_batch_sharding(mesh: Mesh) -> dict:
    """NamedShardings for the dense path's inputs: batch on ``data``, node
    dimension on ``graph``, feature/coord dims replicated."""
    return {
        "feats": NamedSharding(mesh, P("data", "graph", None)),
        "tokens": NamedSharding(mesh, P("data", "graph")),
        "coors": NamedSharding(mesh, P("data", "graph", None)),
        "mask": NamedSharding(mesh, P("data", "graph")),
        "adj_mat": NamedSharding(mesh, P(None, None)),
        "edges": NamedSharding(mesh, P("data", "graph", None, None)),
        "replicated": NamedSharding(mesh, P()),
    }


def sparse_node_sharding(mesh: Mesh) -> dict:
    """NamedShardings for the sparse path: packed nodes and edges sharded over
    the combined (data, graph) axes (edge partitioning)."""
    return {
        "x": NamedSharding(mesh, P(("data", "graph"), None)),
        "nodes": NamedSharding(mesh, P(("data", "graph"))),
        "edges": NamedSharding(mesh, P(None, ("data", "graph"))),
        "edge_attr": NamedSharding(mesh, P(("data", "graph"), None)),
        "replicated": NamedSharding(mesh, P()),
    }
