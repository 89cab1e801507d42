"""Minimal torch_geometric stand-in so the reference's SPARSE path can run
as a parity oracle in environments without PyG.

The reference guards its PyG imports (egnn_pytorch_geometric.py:14-27) and
falls back to ``MessagePassing = object``, which makes ``EGNN_Sparse``
unconstructible — so without this shim the sparse oracle simply cannot run
here. The shim implements, from PyG's PUBLIC semantics (not its code), the
exact surface the reference touches:

- ``nn.MessagePassing`` with flow='source_to_target' conventions:
  ``*_i`` gathers at ``edge_index[1]`` (target), ``*_j`` at ``edge_index[0]``
  (source); ``aggregate`` is a scatter add/sum/mean/max to the target with
  ``dim_size`` segments (torch-scatter semantics: mean divides by counts,
  empty max segments are 0); the ``inspector``/``_collect`` plumbing passes
  exactly the parameters each hook's signature names
  (egnn_pytorch_geometric.py:227-232 relies on these internals).
- ``nn.norm.LayerNorm`` in PyG's mode='graph': statistics over all
  node x channel entries of each graph, biased variance, eps 1e-5, affine.
- ``typing.{Adj, Size, OptTensor, Tensor}`` aliases.

Install with ``install()`` BEFORE the first ``import egnn_pytorch``.
"""
from __future__ import annotations

import inspect
import sys
import types

import torch
from torch import nn


class MessagePassing(nn.Module):
    def __init__(self, aggr: str = "add", **kwargs):
        super().__init__()
        self.aggr = aggr

    @property
    def _user_args(self):
        return [
            p for p in inspect.signature(self.message).parameters
            if p != "self"
        ]

    def _check_input(self, edge_index, size):
        return [None, None] if size is None else list(size)

    def _collect(self, user_args, edge_index, size, kwargs):
        src, dst = edge_index[0], edge_index[1]
        coll = {}
        for arg in user_args:
            if arg.endswith("_i"):
                coll[arg] = kwargs[arg[:-2]][dst]
            elif arg.endswith("_j"):
                coll[arg] = kwargs[arg[:-2]][src]
            else:
                coll[arg] = kwargs[arg]
        coll["index"] = dst
        coll["dim_size"] = kwargs["x"].size(0)
        return coll

    class _Inspector:
        def __init__(self, owner):
            self._owner = owner

        def collect_param_data(self, func_name, coll_dict):
            fn = getattr(self._owner, func_name)
            params = [
                p for p in inspect.signature(fn).parameters if p != "self"
            ]
            return {p: coll_dict[p] for p in params if p in coll_dict}

    @property
    def inspector(self):
        return MessagePassing._Inspector(self)

    def aggregate(self, inputs, index, dim_size=None):
        n = dim_size if dim_size is not None else int(index.max()) + 1
        shape = (n,) + inputs.shape[1:]
        if self.aggr in ("add", "sum"):
            out = inputs.new_zeros(shape)
            out.index_add_(0, index, inputs)
            return out
        if self.aggr == "mean":
            out = inputs.new_zeros(shape)
            out.index_add_(0, index, inputs)
            count = inputs.new_zeros((n,))
            count.index_add_(0, index, torch.ones_like(index, dtype=inputs.dtype))
            return out / count.clamp(min=1).view(-1, *([1] * (inputs.dim() - 1)))
        if self.aggr == "max":
            out = inputs.new_full(shape, float("-inf"))
            idx = index.view(-1, *([1] * (inputs.dim() - 1))).expand_as(inputs)
            out.scatter_reduce_(0, idx, inputs, reduce="amax", include_self=True)
            return torch.where(torch.isinf(out), out.new_zeros(()), out)
        raise ValueError(f"unknown aggr {self.aggr!r}")

    def update(self, inputs, **kwargs):
        return inputs


class GraphLayerNorm(nn.Module):
    """PyG nn.norm.LayerNorm, mode='graph': per-graph statistics over all
    node x channel entries, biased variance, eps=1e-5, affine."""

    def __init__(self, in_channels, eps: float = 1e-5):
        super().__init__()
        self.in_channels = in_channels
        self.eps = eps
        self.weight = nn.Parameter(torch.ones(in_channels))
        self.bias = nn.Parameter(torch.zeros(in_channels))

    def forward(self, x, batch=None):
        if batch is None:
            batch = torch.zeros(x.size(0), dtype=torch.long, device=x.device)
        num_graphs = int(batch.max()) + 1
        d = x.size(-1)
        count = x.new_zeros(num_graphs)
        count.index_add_(0, batch, x.new_ones(x.size(0)))
        count = (count * d).clamp(min=1)
        total = x.new_zeros(num_graphs)
        total.index_add_(0, batch, x.sum(-1))
        mean = (total / count)[batch].unsqueeze(-1)
        centered = x - mean
        sq = x.new_zeros(num_graphs)
        sq.index_add_(0, batch, (centered ** 2).sum(-1))
        var = (sq / count)[batch].unsqueeze(-1)
        out = centered / (var + self.eps).sqrt()
        return out * self.weight + self.bias


def install():
    """Register the shim as ``torch_geometric`` in sys.modules (no-op if the
    real package is importable)."""
    try:
        import torch_geometric  # noqa: F401
        return False
    except ImportError:
        pass
    tg = types.ModuleType("torch_geometric")
    tg_nn = types.ModuleType("torch_geometric.nn")
    tg_norm = types.ModuleType("torch_geometric.nn.norm")
    tg_typing = types.ModuleType("torch_geometric.typing")
    tg_nn.MessagePassing = MessagePassing
    tg_norm.LayerNorm = GraphLayerNorm
    tg_nn.norm = tg_norm
    tg.nn = tg_nn
    tg_typing.Adj = object
    tg_typing.Size = object
    tg_typing.OptTensor = object
    tg_typing.Tensor = torch.Tensor
    tg.typing = tg_typing
    sys.modules["torch_geometric"] = tg
    sys.modules["torch_geometric.nn"] = tg_nn
    sys.modules["torch_geometric.nn.norm"] = tg_norm
    sys.modules["torch_geometric.typing"] = tg_typing
    return True
