"""Edge partitioning for the multi-device sparse/COO path (SURVEY.md §2c).

Layout contract (consumed by EGNNSparse(shard_axis=...)):
- nodes are block-sharded over the mesh axis: shard s owns global nodes
  [s*nl, (s+1)*nl) where nl = n // shards;
- every edge lives on the shard that OWNS ITS RECEIVER, with the receiver id
  localized (global - s*nl) and the sender id kept GLOBAL — resolved at
  compute time against one all-gather of the node tensor over ICI per layer
  (the halo exchange);
- per-shard edge counts are padded to a common static capacity and masked,
  keeping shapes identical across shards (SPMD requires it).

``partition_edges`` is the host/jit-side repacker producing that layout from
any global COO edge list; packing is stable, so the receiver-major invariant
of ops/graph.py builders survives localization.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp


class PartitionedEdges(NamedTuple):
    """Concatenated per-shard edge arrays; shard s owns rows
    [s*capacity, (s+1)*capacity). Shard over the mesh axis with
    PartitionSpec((axis,)) so each device sees its (capacity,) slice."""

    senders: jnp.ndarray      # (shards*capacity,) int32 — GLOBAL ids
    receivers: jnp.ndarray    # (shards*capacity,) int32 — LOCAL ids
    mask: jnp.ndarray         # (shards*capacity,) bool
    edge_attr: Optional[jnp.ndarray]  # (shards*capacity, e) or None
    capacity: int


def partition_edges(
    senders: jnp.ndarray,
    receivers: jnp.ndarray,
    n: int,
    shards: int,
    edge_attr: Optional[jnp.ndarray] = None,
    edge_mask: Optional[jnp.ndarray] = None,
    capacity: Optional[int] = None,
) -> PartitionedEdges:
    """Repack a global COO edge list into the receiver-owned shard layout.

    ``capacity`` is the static per-shard edge budget (default: the full
    global edge count, always sufficient; pass a tighter bound to save
    memory — overflowing edges are dropped deterministically from the end).
    """
    assert n % shards == 0, f"n={n} must divide evenly over {shards} shards"
    nl = n // shards
    e = senders.shape[0]
    cap = capacity if capacity is not None else e
    valid = jnp.ones((e,), bool) if edge_mask is None else edge_mask
    shard_of = receivers // nl

    snd_parts, rcv_parts, msk_parts, attr_parts = [], [], [], []
    for s_ in range(shards):
        sel = valid & (shard_of == s_)
        # stable pack: selected edges first, original (receiver-major) order
        order = jnp.argsort(~sel, stable=True)[:cap]
        m = sel[order]
        snd_parts.append(jnp.where(m, senders[order], 0).astype(jnp.int32))
        rcv_parts.append(
            jnp.where(m, receivers[order] - s_ * nl, 0).astype(jnp.int32)
        )
        msk_parts.append(m)
        if edge_attr is not None:
            attr_parts.append(
                jnp.where(m[:, None], edge_attr[order], 0)
            )

    return PartitionedEdges(
        senders=jnp.concatenate(snd_parts),
        receivers=jnp.concatenate(rcv_parts),
        mask=jnp.concatenate(msk_parts),
        edge_attr=jnp.concatenate(attr_parts) if edge_attr is not None else None,
        capacity=cap,
    )


def partition_uniform_edges(
    senders: jnp.ndarray,
    n: int,
    shards: int,
    degree: int,
    edge_attr: Optional[jnp.ndarray] = None,
    edge_mask: Optional[jnp.ndarray] = None,
) -> PartitionedEdges:
    """Shard a receiver-major UNIFORM-DEGREE edge layout (every kNN builder's
    output: edge rows [i*degree, (i+1)*degree) belong to receiver i by
    position — see ops/segment.py:uniform_aggregate).

    With nodes block-sharded, shard s's edges are exactly the contiguous row
    range [s*nl*degree, (s+1)*nl*degree): partitioning is a pure slice — no
    repacking, no per-shard capacity search, and the positional contract
    survives, so ``EGNNSparse(shard_axis=..., uniform_degree=degree)`` keeps
    scatter-free aggregation on every shard. Receiver ids are regenerated as
    local positions (the uniform path ignores them, but the edge_index API
    carries them); senders stay GLOBAL, resolved against the per-layer
    all-gather.
    """
    assert n % shards == 0, f"n={n} must divide evenly over {shards} shards"
    e = senders.shape[0]
    assert e == n * degree, (
        f"uniform layout needs n*degree={n * degree} edge rows, got {e}"
    )
    nl = n // shards
    receivers_local = jnp.tile(
        jnp.repeat(jnp.arange(nl, dtype=jnp.int32), degree), shards
    )
    mask = jnp.ones((e,), bool) if edge_mask is None else edge_mask
    return PartitionedEdges(
        senders=senders.astype(jnp.int32),
        receivers=receivers_local,
        mask=mask,
        edge_attr=edge_attr,
        capacity=nl * degree,
    )
