"""Graph construction utilities for the sparse/COO path.

TPU-native replacement for the external graph builders the reference relies on
(torch-cluster knn/radius graphs, installed in examples/egnn_test.ipynb cell 4,
and the notebook's ``nth_deg_adjacency``/``prot_covalent_bond`` helpers).
Everything returns *static-shape* edge lists: a fixed edge capacity plus a
boolean validity mask, the TPU idiom for variable-size graphs.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class EdgeSet(NamedTuple):
    """A static-capacity COO edge list.

    ``senders``/``receivers``: (E,) int32. ``mask``: (E,) bool — False rows are
    padding and must not contribute to any aggregation. Padding rows point at
    node 0 so gathers stay in-bounds.
    """

    senders: jnp.ndarray
    receivers: jnp.ndarray
    mask: jnp.ndarray

    @property
    def edge_index(self) -> jnp.ndarray:
        """PyG-style (2, E) layout: row 0 = source/j, row 1 = target/i."""
        return jnp.stack([self.senders, self.receivers], axis=0)


def _batched_knn(cg, k, mg, loop):
    """(g, m, c) batched selection -> (idx (g, m, kw) int32 within-graph slot
    ids, vals (g, m, kw)) via ops/neighbors.knn_select — the Pallas selection
    kernels on TPU (full-band / j-tiled; O(tile) memory at ANY m), the jnp
    (m, m) path on CPU and tiny graphs.

    ``loop=False`` selects min(k+1, m) and drops the self slot per row (self
    distance 0 always ranks in the top k+1; with >k exact-zero
    duplicate-coordinate ties the last slot is dropped instead — the kept set
    is still the smallest non-self entries). In the degenerate ``m <= k``
    regime the output width is m-1 (every other node, still self-free); the
    builders read the width off the array, so capacity just shrinks.
    Masked pairs carry the kernels' 1e5 ranking fill, so validity is
    ``val < 1e5`` — coordinates are assumed scaled so real squared distances
    stay below 1e5 (the reference's own masked-fill convention,
    egnn_pytorch.py:242).
    """
    from .neighbors import knn_select

    m = cg.shape[1]
    if loop:
        nbhd = knn_select(cg, min(k, m), float("inf"), mask=mg)
        return nbhd.indices, nbhd.ranking

    kk = min(k + 1, m)
    kw = kk - 1                                           # self-free width
    nbhd = knn_select(cg, kk, float("inf"), mask=mg)
    idx, vals = nbhd.indices, nbhd.ranking                # (g, m, kk)
    row = jnp.arange(m, dtype=idx.dtype)[None, :, None]
    keep = idx != row
    has_self = (~keep).any(axis=-1)
    drop_tail = (~has_self)[..., None] & (jnp.arange(kk) == kk - 1)
    keep = keep & ~drop_tail                              # exactly kw kept/row
    pos = jnp.cumsum(keep, axis=-1)                       # 1-based rank kept
    oh = keep[:, :, None, :] & (
        pos[:, :, None, :] == (jnp.arange(kw)[:, None] + 1)
    )
    out_idx = jnp.sum(jnp.where(oh, idx[:, :, None, :], 0), axis=-1)
    out_vals = jnp.sum(
        jnp.where(oh, vals[:, :, None, :], jnp.zeros((), vals.dtype)), axis=-1
    )
    return out_idx.astype(jnp.int32), out_vals


def _ragged_caps(batch, max_graph_size, max_graphs):
    """Static (m_cap, G) for the ragged bucketed path. Derived EXACTLY from a
    concrete ``batch`` (the common case: graph building happens in the data
    pipeline, outside jit); under jit the caller must supply both caps."""
    if max_graph_size is not None and max_graphs is not None:
        return int(max_graph_size), int(max_graphs)
    if isinstance(batch, jax.core.Tracer):
        return None
    import numpy as np

    bnp = np.asarray(batch)
    if bnp.size and (np.diff(bnp) < 0).any():
        raise ValueError(
            "knn_graph/radius_graph_capped: `batch` must be sorted "
            "(torch-cluster convention)"
        )
    counts = np.bincount(bnp) if bnp.size else np.asarray([0])
    m_cap = int(max_graph_size) if max_graph_size is not None else int(counts.max())
    G = int(max_graphs) if max_graphs is not None else int(counts.size)
    return max(m_cap, 1), max(G, 1)


def _ragged_knn(coors, k, node_mask, loop, batch, m_cap, G):
    """Ragged multi-graph kNN WITHOUT the (n, n) matrix: scatter nodes into a
    (G, m_cap) padded grid (slot = within-graph position, requires sorted
    ``batch``), run the batched kernel selection per graph row, and map the
    winning slots back to global node ids in original node order.

    Memory/compute is O(G * m_cap^2) instead of O(n^2) — at 65k nodes of
    <=512-node graphs that is 128x less selection work and no 17 GB matrix.
    Nodes of graphs larger than ``m_cap`` (possible only when explicit caps
    undershoot; exact caps are derived for concrete batches) are dropped:
    their rows and their edges come back invalid, and their grid writes land
    in a sacrificial extra row/column so they can never corrupt a real
    node's slot (scatter duplicates apply in unspecified order).

    Edge validity is derived from the SELECTED slot's grid mask, not from
    comparing ranking values against the 1e5 masked fill — real pairs with
    squared distance >= 1e5 stay valid, matching the (n, n) fallback."""
    n = coors.shape[0]
    c = coors.shape[-1]
    batch = batch.astype(jnp.int32)
    counts = jax.ops.segment_sum(jnp.ones((n,), jnp.int32), batch, G)
    starts = jnp.cumsum(counts) - counts
    pos = jnp.arange(n, dtype=jnp.int32) - starts[batch]
    ok_node = (pos < m_cap) & (batch < G)
    if node_mask is not None:
        ok_node = ok_node & node_mask
    pos_c = jnp.minimum(pos, m_cap - 1)
    bat_c = jnp.minimum(batch, G - 1)
    # dropped nodes write into the sacrificial row G / column m_cap,
    # sliced away before selection
    pos_s = jnp.where(ok_node, pos_c, m_cap)
    bat_s = jnp.where(ok_node, bat_c, G)

    grid_coors = jnp.zeros((G + 1, m_cap + 1, c), coors.dtype).at[
        bat_s, pos_s].set(jnp.where(ok_node[:, None], coors, 0.0))[:G, :m_cap]
    grid_mask = jnp.zeros((G + 1, m_cap + 1), bool).at[bat_s, pos_s].set(
        ok_node)[:G, :m_cap]
    grid_gid = jnp.zeros((G + 1, m_cap + 1), jnp.int32).at[bat_s, pos_s].set(
        jnp.where(ok_node, jnp.arange(n, dtype=jnp.int32), 0))[:G, :m_cap]

    idx, vals = _batched_knn(grid_coors, k, grid_mask, loop)  # (G, m_cap, kw)
    kw = idx.shape[-1]
    gidx = jnp.arange(G)[:, None, None]
    # slot -> global id + slot validity, then read each original node's row
    gid = grid_gid[gidx, idx]                                  # (G, m_cap, kw)
    sel_ok = grid_mask[gidx, idx]                              # real neighbor?
    idx_n = gid[bat_c, pos_c]                                  # (n, kw)
    vals_n = vals[bat_c, pos_c]
    ok_pair = sel_ok[bat_c, pos_c] & ok_node[:, None]
    fill = jnp.asarray(1e10, vals_n.dtype)
    vals_n = jnp.where(ok_pair, vals_n, fill)
    return idx_n.astype(jnp.int32), vals_n, fill


def _knn_indices(coors, k, node_mask, loop, batch, graph_size,
                 max_graph_size=None, max_graphs=None):
    """Shared kNN machinery for the edge builders. Returns (idx (n, k) with
    GLOBAL node ids, vals (n, k) ranking values, fill (scalar) the
    masked/invalid ranking fill to compare against)."""
    from .neighbors import MASKED_RANK_FILL

    n = coors.shape[0]
    if batch is not None and graph_size is None:
        caps = _ragged_caps(batch, max_graph_size, max_graphs)
        if caps is not None:
            return _ragged_knn(coors, k, node_mask, loop, batch, *caps)
        # traced batch without caps: the (n, n) jnp fallback — guarded, it is
        # exactly the scale trap the kernels exist to avoid
        if n > 8192:
            raise ValueError(
                f"knn_graph with a traced `batch` vector and no "
                f"max_graph_size/max_graphs caps takes the O(n^2) fallback — "
                f"refusing at n={n}. Pass static max_graph_size and "
                f"max_graphs (or graph_size for packed uniform batches), or "
                f"build edges outside jit where the caps are derived "
                f"automatically."
            )
        rel = coors[:, None, :] - coors[None, :, :]
        dist = jnp.sum(rel * rel, axis=-1)
        big = jnp.asarray(1e10, dist.dtype)
        if not loop:
            dist = jnp.where(jnp.eye(n, dtype=bool), big, dist)
        if node_mask is not None:
            pair_ok = node_mask[:, None] & node_mask[None, :]
            dist = jnp.where(pair_ok, dist, big)
        dist = jnp.where(batch[:, None] == batch[None, :], dist, big)
        neg_vals, idx = jax.lax.top_k(-dist, k)
        return idx.astype(jnp.int32), -neg_vals, big
    if graph_size is not None:
        # packed uniform batch [0]*gs + [1]*gs + ...: reshape to the batched
        # kernel layout — each graph is one batch row, no (n, n) intermediate
        assert n % graph_size == 0, "graph_size must divide the node count"
        g, m = n // graph_size, graph_size
        cg = coors.reshape(g, m, -1)
        mg = None if node_mask is None else node_mask.reshape(g, m)
        idx, vals = _batched_knn(cg, k, mg, loop)
        kk_eff = idx.shape[-1]
        base = (jnp.arange(g, dtype=jnp.int32) * m)[:, None, None]
        idx_g = (idx + base).reshape(n, kk_eff)
        vals_g = vals.reshape(n, kk_eff)
        fill = MASKED_RANK_FILL if node_mask is not None else jnp.inf
        return idx_g, vals_g, jnp.asarray(fill, vals_g.dtype)
    idx, vals = _batched_knn(coors[None], k,
                             None if node_mask is None else node_mask[None],
                             loop)
    idx, vals = idx[0], vals[0]
    # nothing is ranking-filled without a node_mask, so every selected pair
    # is a real neighbor
    fill = MASKED_RANK_FILL if node_mask is not None else jnp.inf
    return idx, vals, jnp.asarray(fill, vals.dtype)


def knn_graph(
    coors: jnp.ndarray,
    k: int,
    node_mask: Optional[jnp.ndarray] = None,
    loop: bool = False,
    batch: Optional[jnp.ndarray] = None,
    graph_size: Optional[int] = None,
    max_graph_size: Optional[int] = None,
    max_graphs: Optional[int] = None,
) -> EdgeSet:
    """Build a k-nearest-neighbor edge set from (N, c) coordinates.

    Each valid node receives edges from its k nearest valid neighbors
    (squared Euclidean ranking, matching the dense path's kNN semantics —
    egnn_pytorch.py:233,258). Returns E = N*k edges with receiver-major order
    (all edges of node 0 first), which makes segment reductions contiguous.

    On TPU the selection runs the Pallas kNN kernels (ops/pallas/knn.py) with
    O(tile) memory — a 65,536-node graph builds without the 17 GB (N, N)
    distance matrix the jnp path would need, which is what makes the sparse
    network's ``recalc_edge`` hook usable at scale.

    ``batch``: optional (N,) SORTED graph ids — neighbors are restricted to
    the same graph (torch-cluster's ``knn_graph(batch=...)`` semantics), so
    one call builds a whole packed multi-graph batch without cross-graph
    edges. Ragged batches are bucketed onto a (num_graphs, max_graph_size)
    padded grid and run the batched kernel selection — O(G * m^2), never the
    (N, N) matrix. The caps are derived exactly when ``batch`` is concrete
    (graph building outside jit, the common case); under jit pass BOTH
    ``max_graph_size`` and ``max_graphs`` statically (a traced batch without
    caps raises above n=8192 instead of silently allocating O(N^2)).
    ``graph_size``: static per-graph node count for PACKED batches (ids
    ``[0]*gs + [1]*gs + ...``, the PrefetchLoader layout) — the batch then
    maps onto the batched kernel layout directly with zero padding overhead.
    """
    n = coors.shape[0]
    idx, vals, fill = _knn_indices(coors, k, node_mask, loop, batch, graph_size,
                                   max_graph_size, max_graphs)
    kk = idx.shape[-1]
    valid = vals < fill
    receivers = jnp.repeat(jnp.arange(n, dtype=jnp.int32), kk)
    senders = idx.reshape(-1).astype(jnp.int32)
    mask = valid.reshape(-1)
    if node_mask is not None:
        mask = mask & jnp.repeat(node_mask, kk)
    senders = jnp.where(mask, senders, 0)
    receivers = jnp.where(mask, receivers, 0)
    return EdgeSet(senders=senders, receivers=receivers, mask=mask)


def radius_graph_capped(
    coors: jnp.ndarray,
    radius: float,
    max_num_neighbors: int = 32,
    node_mask: Optional[jnp.ndarray] = None,
    loop: bool = False,
    batch: Optional[jnp.ndarray] = None,
    graph_size: Optional[int] = None,
    max_graph_size: Optional[int] = None,
    max_graphs: Optional[int] = None,
) -> EdgeSet:
    """Radius graph with a PER-NODE neighbor cap — torch-cluster's
    ``radius_graph(r, max_num_neighbors=...)`` semantics, and the streaming-
    friendly formulation: selection is the kNN kernel (closest
    ``max_num_neighbors`` per node, O(tile) memory at any N on TPU) followed
    by the ``dist <= r^2`` validity cut. Rows with more than the cap inside
    the radius keep the closest ones (deterministic). Receiver-major,
    E = N * max_num_neighbors static capacity.

    Unlike ``radius_graph`` (global closest-first edge budget over a
    materialized (N, N) matrix), this scales to 65k+ nodes.
    """
    n = coors.shape[0]
    k = max_num_neighbors
    idx, vals, fill = _knn_indices(coors, k, node_mask, loop, batch, graph_size,
                                   max_graph_size, max_graphs)
    kk = idx.shape[-1]
    r2 = jnp.asarray(radius, vals.dtype) ** 2
    valid = (vals <= r2) & (vals < fill)
    receivers = jnp.repeat(jnp.arange(n, dtype=jnp.int32), kk)
    senders = idx.reshape(-1).astype(jnp.int32)
    mask = valid.reshape(-1)
    if node_mask is not None:
        mask = mask & jnp.repeat(node_mask, kk)
    senders = jnp.where(mask, senders, 0)
    receivers = jnp.where(mask, receivers, 0)
    return EdgeSet(senders=senders, receivers=receivers, mask=mask)


def radius_graph(
    coors: jnp.ndarray,
    radius: float,
    max_edges: int,
    node_mask: Optional[jnp.ndarray] = None,
    loop: bool = False,
) -> EdgeSet:
    """All pairs within ``radius``, packed into a static ``max_edges`` capacity.

    Pairs beyond capacity are dropped deterministically (closest first), so the
    result is stable under jit. Distances use the squared-Euclidean convention.

    This GLOBAL-budget variant materializes the (N, N) distance matrix and is
    guarded to small graphs; at scale use ``radius_graph_capped`` (per-node
    cap, kernel-routed, O(tile) memory at any N).
    """
    n = coors.shape[0]
    if n > 8192:
        raise ValueError(
            f"radius_graph materializes an (N, N) distance matrix — refusing "
            f"at n={n}. Use radius_graph_capped (per-node neighbor cap, "
            f"kernel-routed) for large graphs."
        )
    rel = coors[:, None, :] - coors[None, :, :]
    dist = jnp.sum(rel * rel, axis=-1)
    ok = dist <= radius**2
    if not loop:
        ok = ok & ~jnp.eye(n, dtype=bool)
    if node_mask is not None:
        ok = ok & (node_mask[:, None] & node_mask[None, :])
    big = jnp.asarray(1e10, dist.dtype)
    flat_dist = jnp.where(ok, dist, big).reshape(-1)
    neg_vals, flat_idx = jax.lax.top_k(-flat_dist, max_edges)
    mask = (-neg_vals) < big
    # Re-sort the selected edges receiver-major, matching the layout
    # invariant of the other builders (contiguous per-receiver edge runs;
    # deterministic order, friendlier to sorted-scatter backends and to
    # future range-based aggregation kernels). Padding sorts last.
    sort_key = jnp.where(mask, flat_idx, n * n)
    order = jnp.argsort(sort_key)
    flat_idx = flat_idx[order]
    mask = mask[order]
    receivers = (flat_idx // n).astype(jnp.int32)
    senders = (flat_idx % n).astype(jnp.int32)
    senders = jnp.where(mask, senders, 0)
    receivers = jnp.where(mask, receivers, 0)
    return EdgeSet(senders=senders, receivers=receivers, mask=mask)


def backbone_covalent_bonds(num_residues: int, atoms_per_residue: int = 3) -> EdgeSet:
    """Covalent-bond edge set for a protein backbone of ``num_residues``
    residues with ``atoms_per_residue`` backbone atoms (N, CA, C by default).

    Capability parity with the reference notebook's ``prot_covalent_bond``
    helper (examples/egnn_test.ipynb addendum cells): intra-residue bonds
    N-CA, CA-C (a chain within each residue) plus the inter-residue peptide
    bond C(i) - N(i+1); emitted bidirectionally, receiver-major, static shape
    E = 2 * (num_residues*(atoms_per_residue-1) + num_residues - 1).
    """
    a = atoms_per_residue
    intra_src, intra_dst = [], []
    for r in range(num_residues):
        base = r * a
        for j in range(a - 1):
            intra_src.append(base + j)
            intra_dst.append(base + j + 1)
    for r in range(num_residues - 1):
        intra_src.append(r * a + (a - 1))  # C of residue r
        intra_dst.append((r + 1) * a)      # N of residue r+1
    src = jnp.asarray(intra_src + intra_dst, dtype=jnp.int32)
    dst = jnp.asarray(intra_dst + intra_src, dtype=jnp.int32)
    order = jnp.argsort(dst, stable=True)
    src, dst = src[order], dst[order]
    mask = jnp.ones(src.shape, dtype=bool)
    return EdgeSet(senders=src, receivers=dst, mask=mask)


def chain_adjacency(n: int, dtype=bool) -> jnp.ndarray:
    """Chain graph i ~ i±1 — the adjacency used by the reference's training
    example (denoise_sparse.py:64-66) and README's only_sparse example."""
    ar = jnp.arange(n)
    return (jnp.abs(ar[:, None] - ar[None, :]) == 1).astype(dtype)


def edges_from_dense_adj(
    adj_mat: jnp.ndarray, max_edges: int, node_mask: Optional[jnp.ndarray] = None
) -> EdgeSet:
    """Convert a dense (N, N) adjacency to a static-capacity COO edge set.

    Deterministic row-major packing; entries beyond ``max_edges`` are dropped.
    """
    n = adj_mat.shape[-1]
    ok = adj_mat.astype(bool)
    if node_mask is not None:
        ok = ok & (node_mask[:, None] & node_mask[None, :])
    flat = ok.reshape(-1)
    # stable pack: score = index for present edges, huge for absent
    order_score = jnp.where(flat, jnp.arange(n * n), n * n)
    neg_vals, flat_idx = jax.lax.top_k(-order_score, max_edges)
    mask = (-neg_vals) < n * n
    receivers = (flat_idx // n).astype(jnp.int32)
    senders = (flat_idx % n).astype(jnp.int32)
    senders = jnp.where(mask, senders, 0)
    receivers = jnp.where(mask, receivers, 0)
    return EdgeSet(senders=senders, receivers=receivers, mask=mask)
