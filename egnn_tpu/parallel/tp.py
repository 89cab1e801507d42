"""Tensor parallelism for the EGNN MLPs (SURVEY.md §2c, "TP" row).

Every MLP in the model is two Linears with an elementwise nonlinearity
between (edge MLP: ein -> 2*ein -> m_dim, egnn_pytorch.py:178-184;
coordinate MLP: m_dim -> 4*m_dim -> 1, :203-208; node MLP likewise). That is
the canonical Megatron column-then-row split: shard the FIRST weight's
output dimension and the SECOND weight's input dimension over a ``model``
axis, keep activations replicated, and the only collective is one
all-reduce after the second matmul — which XLA/GSPMD inserts automatically
once the parameters carry these shardings. No model-code changes: the
sharding lives entirely in parameter placement.

Worth it only when the hidden dims are large (dim >= ~512 layers); at the
default dim=32 the all-reduce latency dwarfs the matmul savings. Params stay
numerically identical — sharding never changes math, only placement
(asserted by tests/test_tp.py against the replicated run).

Divisibility caveat: keeping the reference's exact parameter shapes means
the edge MLP's hidden is ``2*(2*dim + 2F + 1 + e)`` — congruent to 2 mod 4
when dim is even and F=e=0 — so it shards at most 2-way; the node MLP
(hidden 2*dim) and coordinate MLP (hidden 4*m_dim) shard to wide axes.
Indivisible parameters are replicated automatically.

Usage::

    mesh = make_tp_mesh(data=2, model=4)
    params = jax.device_put(params, tp_param_sharding(params, mesh))
    out = jax.jit(apply_fn)(params, ...)   # GSPMD partitions the matmuls
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_tp_mesh(
    data: int = 1,
    model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """(data, model) mesh for DP x TP. ``data`` outermost (DCN rule)."""
    devices = list(devices if devices is not None else jax.devices())
    if data * model != len(devices):
        raise ValueError(
            f"mesh size data*model={data * model} != device count {len(devices)}"
        )
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, axis_names=("data", "model"))


def tp_param_spec(name: str) -> P:
    """PartitionSpec for one parameter by its flat name.

    Megatron split over the MLP pairs (models/egnn.py / egnn_sparse.py name
    their Linears ``<mlp>_0_{w,b}`` / ``<mlp>_1_{w,b}``): first Linear is
    column-parallel (output dim sharded, bias sharded), second is
    row-parallel (input dim sharded, bias replicated). Everything else —
    norms, gates, embeddings, CoorsNorm scale — is replicated.
    """
    if name.endswith("_0_w"):
        return P(None, "model")
    if name.endswith("_0_b"):
        return P("model")
    if name.endswith("_1_w"):
        return P("model", None)
    return P()


def tp_param_sharding(params, mesh: Mesh):
    """Pytree of NamedShardings mirroring ``params`` (nested dicts of flat
    named arrays, as all egnn_tpu models produce).

    A dimension is only sharded when the axis size divides it — EGNN hidden
    dims are ``2*(2*dim + 2F + 1 + e)`` (odd base, egnn_pytorch.py:175), so
    e.g. dim=64 gives hidden 258, which an 8-way axis cannot split; such
    parameters fall back to replication (correct, just not parallel).
    """
    axis = mesh.shape["model"]

    def spec_of(path, leaf):
        name = path[-1].key if path else ""
        spec = tp_param_spec(str(name))
        for dim_i, ax in enumerate(spec):
            if ax is not None and leaf.shape[dim_i] % axis != 0:
                spec = P()
                break
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(spec_of, params)
