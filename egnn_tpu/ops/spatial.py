"""Spatial-grid kNN candidate pruning with an exactness certificate.

The structural lever for selection beyond the quadratic kernels
(BASELINE.md: at n=16384 the full-band Pallas kernel is AT the VPU roofline
— ~6 ms at k=16 — because it scans all n^2 pairs; spatial pruning is the
only way past it). Replaces the O(n^2) ranking band with O(n * C)
candidates, C = 27 * cell capacity:

1. bin nodes into a STATIC gdim^3 cell grid with EQUAL-MASS per-axis
   quantile edges (see cell_assignment — clustered clouds would overflow
   equal-width cells; one argsort gives within-cell slot positions — the
   same padded-grid idiom as ops/graph.py:_ragged_knn, sacrificial slot
   for overflow);
2. each node's candidates are the nodes of its 27-cell block, read as 27
   CONTIGUOUS (m_cap, c) blocks per node (block gathers stream, row
   gathers don't — the library's gather cost model);
3. exact f32 ranking + top-k over the (n, C) candidate band.

Exactness is certified per call, not assumed (same discipline as the
packed-candidate kernels in ops/pallas/knn.py):
- every true k-nearest set is inside the 27-block if sqrt(d_k) <= the
  node's distance to its block boundary — checked per node against the
  MEASURED kth candidate distance, with box-side faces counting as
  infinite margin (the region beyond the bounding box is empty);
- rows with boundary ties (more than k candidates at <= d_k), rows with
  fewer than k valid candidates, and any cell overflow all fail the
  certificate;
- callers lax.cond to the exact kernels on failure, so results are always
  exact. Within the selected k, ties order by (distance, global id) —
  exactly jax.lax.top_k's global tie order.

Reference semantics mirrored from ops/neighbors.knn_select: self IS a
candidate (the reference selects the self pair, egnn_pytorch.py:258);
masked rows return the first-k-columns 1e5-fill rows the masked ranking
produces. Adjacency overrides are out of scope (spatial structure only).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from .neighbors import MASKED_RANK_FILL


def grid_dims(n: int, occupancy: float = 8.0, m_cap: Optional[int] = None):
    """Static (gdim, m_cap) for n nodes at the target mean cell occupancy."""
    gdim = max(3, int(round((n / occupancy) ** (1.0 / 3.0))))
    if m_cap is None:
        # Poisson(occ) tail: 4x the mean makes overflow ~never for uniform
        # data; overflow is certificate-detected, not silent, regardless.
        m_cap = int(occupancy * 4)
    m_cap = max(m_cap, 1)
    return gdim, m_cap


def _neighbor_cells(gdim: int) -> jnp.ndarray:
    """(G, 27) linear ids of each cell's 3^3 block; G = sentinel (out of
    bounds)."""
    g = jnp.arange(gdim ** 3, dtype=jnp.int32)
    ix, iy, iz = g // (gdim * gdim), (g // gdim) % gdim, g % gdim
    offs = jnp.arange(-1, 2, dtype=jnp.int32)
    ox = offs[:, None, None]
    oy = offs[None, :, None]
    oz = offs[None, None, :]
    nx = ix[:, None, None, None] + ox
    ny = iy[:, None, None, None] + oy
    nz = iz[:, None, None, None] + oz
    inb = ((nx >= 0) & (nx < gdim) & (ny >= 0) & (ny < gdim)
           & (nz >= 0) & (nz < gdim))
    lin = (nx * gdim + ny) * gdim + nz
    return jnp.where(inb, lin, gdim ** 3).reshape(gdim ** 3, 27)


def cell_assignment(c32, valid, gdim):
    """Shared grid geometry for the jnp and Pallas grid-kNN paths.

    Args: c32 (n, 3) f32, valid (n,) bool, static gdim.
    Returns (cid (n,) int32 cell id with masked nodes -> sentinel G,
    pos (n,) int32 within-cell slot, counts (G+1,) int32 valid-node cell
    populations, margin (n,) f32 distance to the nearest INTERIOR 27-block
    face — box-coincident faces bound empty space and count as inf).

    Bins are EQUAL-MASS per axis (quantile edges from a per-axis sort),
    not equal-width: clustered clouds overflow a uniform grid's central
    cells (a Gaussian core at n=16384/gdim=6 holds many x the 128-slot
    cap, so every call used to fail the early certificate and pay the
    exact-kernel fallback — measured 7.65 vs the grid's 3.0 ms). With
    per-axis quantile edges any axis-independent density yields ~uniform
    expected occupancy (n/G per cell), so realistic clouds certify. The
    27-block coverage proof only needs MONOTONE per-axis faces, so the
    certificate logic is unchanged — faces just live at edge-array
    positions. Binning compares x >= edge directly (exact, no
    floor-quotient misplacement), so the old absolute 1e-5*edge margin
    shave becomes a relative one covering f32 subtract/square error.
    """
    n = c32.shape[0]
    G = gdim ** 3

    # ---- per-axis equal-mass edges over valid nodes ----
    big = jnp.float32(3.4e38)
    cs = jnp.sort(jnp.where(valid[:, None], c32, big), axis=0)  # (n, 3)
    nv = jnp.sum(valid.astype(jnp.int32))
    # interior edges at valid ranks floor(i*nv/gdim), i = 1..gdim-1
    ranks = jnp.clip((jnp.arange(1, gdim, dtype=jnp.int32) * nv) // gdim,
                     0, n - 1)
    inner = jnp.take(cs, ranks, axis=0)             # (gdim-1, 3)

    # bin index = #(interior edges <= x); vectorized compare-sum, no
    # gathers (gdim is small); invalid rows bin arbitrarily (cid -> G)
    ia = jnp.sum(
        (c32[:, None, :] >= inner[None, :, :]).astype(jnp.int32), axis=1
    )  # (n, 3) in [0, gdim-1]

    # per-node distance to the nearest 27-block face; faces that coincide
    # with (or lie beyond) the bounding box bound an EMPTY region -> inf.
    # Face positions e[ia-1] / e[ia+2] come from the edge arrays via a
    # one-hot contraction ((n, gdim-1) * (gdim-1,) sums — the library's
    # gather cost model says per-row gathers are the expensive class, a
    # broadcast compare-sum is not). Interior faces are edge indices
    # 1..gdim-1, i.e. inner[j] is face j+1: low face ia-1 interior iff
    # ia >= 2 (inner slot ia-2), high face ia+2 interior iff ia <= gdim-3
    # (inner slot ia+1).
    inf = jnp.float32("inf")
    slot = jnp.arange(gdim - 1, dtype=jnp.int32)
    onehot_lo = (slot[None, :, None] == (ia - 2)[:, None, :]).astype(
        jnp.float32)
    onehot_hi = (slot[None, :, None] == (ia + 1)[:, None, :]).astype(
        jnp.float32)
    e_lo = jnp.sum(onehot_lo * inner[None, :, :], axis=1)   # (n, 3)
    e_hi = jnp.sum(onehot_hi * inner[None, :, :], axis=1)
    m_lo = jnp.where(ia >= 2, c32 - e_lo, inf)
    m_hi = jnp.where(ia <= gdim - 3, e_hi - c32, inf)
    # relative shave: binning compares are exact; the remaining f32 error
    # (face subtraction, the kernel's squared distances, margin^2) is a
    # few ulps relative — 1e-4 leaves ~1000x slack while rejecting
    # essentially no true coverage
    margin = jnp.min(jnp.minimum(m_lo, m_hi), axis=-1)  # (n,)
    margin = jnp.maximum(margin, 0.0) * jnp.float32(1.0 - 1e-4)
    cid = (ia[:, 0] * gdim + ia[:, 1]) * gdim + ia[:, 2]
    cid = jnp.where(valid, cid, G)          # masked nodes -> sentinel cell

    # ---- within-cell slot via one sort (stable: slot order = node order) --
    counts = jax.ops.segment_sum(valid.astype(jnp.int32), cid, G + 1)
    starts = jnp.cumsum(counts) - counts
    order = jnp.argsort(cid, stable=True)                  # (n,)
    pos_sorted = jnp.arange(n, dtype=jnp.int32) - starts[cid[order]]
    pos = jnp.zeros((n,), jnp.int32).at[order].set(pos_sorted)
    return cid, pos, counts, margin


def resort_and_certify(vals, gid, valid, margin, n_valid_cand, cnt_le,
                       overflow, k, has_mask):
    """Shared tail of the jnp and Pallas grid paths: exact-tie-order
    re-sort, the exactness certificate, and masked-row fill.

    Args: vals (n, k) f32 ascending selected squared distances in ARBITRARY
    tie order, gid (n, k) int32 their global ids, valid (n,) bool query
    validity, margin (n,) f32 (eps-shaved block-face margins from
    :func:`cell_assignment`), n_valid_cand (n,) real candidates in the
    27-block, cnt_le (n,) candidates with distance <= the kth selected —
    or None when the producer already selected by exact (distance, gid)
    lex order (the grid kernel), making boundary ties harmless —
    overflow scalar bool, static k and has_mask.

    Returns (vals, idx, ok, row_exact) where ok certifies exact equality
    with the masked reference selection and row_exact (n,) bool marks the
    rows that are INDIVIDUALLY certified-or-masked-filled (the grid
    dispatcher's bucketed per-row repair recomputes only ~row_exact rows;
    under ``overflow`` no row is trusted — missing table entries poison
    neighbors' candidate sets too). Whole-call components:
    - coverage is STRICT (vkth < margin^2) on the shaved margin;
    - cnt_le == k (when given) rejects boundary tie groups;
    - with a mask, vkth < MASKED_RANK_FILL is additionally required: the
      exact path ranks masked pairs AT the 1e5 fill, so whenever the kth
      real neighbor would rank >= 1e5 the exact selection prefers masked
      pairs the grid's candidate tables exclude — the grid result would
      silently diverge without this component.
    """
    # lex (val, gid) re-sort == lax.top_k's global tie order. The Pallas
    # kernel (cnt_le=None) already EMITS rows in exact lex order — its
    # extraction rounds take the (distance, gid) minimum of the remaining
    # band, so the output is ascending by construction and the re-sort
    # would be an identity permutation costing real time: take_along_axis
    # on the minor axis is a lane-crossing gather, ~2 ms per call at
    # (16384, 16) on v5e — three of them made the finalize tail 11.4 ms,
    # swallowing the kernel's entire 3.3x win (round-4 breakdown). The jnp
    # path still needs the re-sort (its top_k returns band-slot tie
    # order); a two-key lax.sort is a vectorized sort network over the
    # 16-lane minor axis — no gathers.
    gid = gid.astype(jnp.int32)
    if cnt_le is not None:
        vals, gid = jax.lax.sort((vals, gid), dimension=1, num_keys=2,
                                 is_stable=True)

    vkth = vals[:, k - 1]
    row_ok = (
        (n_valid_cand >= k)
        & (vkth < margin * margin)
    )
    if cnt_le is not None:
        row_ok = row_ok & (cnt_le == k)
    if has_mask:
        row_ok = row_ok & (vkth < jnp.float32(MASKED_RANK_FILL))
    row_exact = (row_ok | ~valid) & ~overflow
    ok = jnp.all(row_exact)

    # masked query rows: the exact masked-ranking output (all pairs filled
    # at 1e5 -> top_k returns columns 0..k-1)
    fill = jnp.float32(MASKED_RANK_FILL)
    colk = jnp.arange(k, dtype=jnp.int32)
    vals = jnp.where(valid[:, None], vals, fill)
    gid = jnp.where(valid[:, None], gid, colk[None, :])
    return vals, gid.astype(jnp.int32), ok, row_exact


def _grid_knn_single(coors, mask, k, gdim, m_cap):
    """One batch element: coors (n, 3), mask (n,) bool or None.
    Returns (vals (n, k) f32 squared distances, idx (n, k) int32, ok)."""
    n = coors.shape[0]
    G = gdim ** 3
    c32 = coors.astype(jnp.float32)
    valid = jnp.ones((n,), bool) if mask is None else mask

    cid, pos, counts, margin = cell_assignment(c32, valid, gdim)
    overflow = jnp.any(counts[:G] > m_cap)

    ok_node = valid & (pos < m_cap)
    # sacrificial row/column isolates overflow + masked writes
    bat_s = jnp.where(ok_node, jnp.minimum(cid, G), G)
    pos_s = jnp.where(ok_node, jnp.minimum(pos, m_cap - 1), m_cap)
    grid_gid = jnp.full((G + 1, m_cap + 1), n, jnp.int32).at[bat_s, pos_s].set(
        jnp.where(ok_node, jnp.arange(n, dtype=jnp.int32), n))[:G + 1, :m_cap]
    # sentinel cell G stays all-n (invalid)
    grid_gid = grid_gid.at[G].set(n)

    # ---- candidates: 27 contiguous blocks per node ----
    nbr = _neighbor_cells(gdim)                            # (G, 27)
    node_cells = jnp.minimum(cid, G - 1)                   # masked rows: junk, bypassed
    node_nbrs = nbr[node_cells]                            # (n, 27)
    cand_gid = grid_gid[node_nbrs].reshape(n, 27 * m_cap)  # (n, C)
    cand_ok = cand_gid < n

    coors_pad = jnp.concatenate([c32, jnp.zeros((1, 3), jnp.float32)], axis=0)
    cand_xyz = coors_pad[jnp.minimum(cand_gid, n)]         # (n, C, 3)
    d = cand_xyz - c32[:, None, :]
    dist = jnp.sum(d * d, axis=-1)                         # (n, C) f32
    dist = jnp.where(cand_ok, dist, jnp.float32("inf"))

    # ---- top-k (band tie order; re-sorted + certified in the shared tail) --
    neg, sel = jax.lax.top_k(-dist, k)                     # (n, k)
    vals = -neg
    gid_sel = jnp.take_along_axis(cand_gid, sel, axis=1)
    n_valid_cand = cand_ok.sum(axis=1)
    cnt_le = jnp.sum(dist <= vals[:, k - 1][:, None], axis=1)
    return resort_and_certify(
        vals, gid_sel, valid, margin, n_valid_cand, cnt_le, overflow, k,
        has_mask=mask is not None)


@functools.partial(jax.jit, static_argnames=("k", "occupancy", "m_cap"))
def grid_knn_select(
    coors: jnp.ndarray,                 # (b, n, 3)
    k: int,
    mask: Optional[jnp.ndarray] = None, # (b, n) bool
    occupancy: Optional[float] = None,
    m_cap: Optional[int] = None,
):
    """Grid-pruned kNN selection candidate for ops/neighbors.knn_select.

    Returns (vals (b, n, k) f32, idx (b, n, k) int32, ok scalar bool,
    row_exact (b, n) bool). ``ok`` certifies the result equals the exact
    masked selection (value AND tie order); on False the caller must
    repair the ~row_exact rows or fall back to the exact kernels
    entirely. 3-D coordinates only (the spatial structure is the point).

    ``occupancy`` (mean nodes per cell) defaults to max(12, 1.5*k): the
    minimum per-node block margin is one cell edge h and the expected
    uniform-data population of a radius-h ball is ~4.2*occupancy, but
    box-corner nodes see only ~1/8 of that ball inside the box — 1.5*k
    keeps even the truncated-ball population above k (measured: 6/6 seeds
    certify at every n in 1k..8k, k in 8..16; 1.0*k leaves stragglers).

    Anisotropy: cells stretch with the bounding box (per-axis edges), so
    the binding margin is the SMALLEST axis edge while the kth-NN radius
    follows the geometric mean — a box with extent ratios (r1, r2, r3)
    needs occupancy boosted by ~(geomean(r)/min(r))^3 to certify (3:1:2
    needs ~6x); beyond that the certificate rejects and callers fall back
    to the exact kernels. Needle-shaped boxes never certify: per-axis cell
    counts would have to be data-dependent, which static shapes forbid.
    """
    b, n, c = coors.shape
    assert c == 3, "grid pruning is 3-D only; use the exact kernels otherwise"
    if occupancy is None:
        occupancy = max(12.0, 1.5 * float(k))
    gdim, m_cap_ = grid_dims(n, occupancy, m_cap)
    if 27 * m_cap_ < k or n < k or gdim < 4:
        # gdim < 4: a corner cell's 27-block covers only 8 of >= 27 cells,
        # so uniform data cannot certify — reject statically (callers skip
        # the grid work instead of paying for a guaranteed fallback)
        # statically impossible to certify: caller falls back
        return (
            jnp.full((b, n, k), jnp.float32(MASKED_RANK_FILL)),
            jnp.broadcast_to(jnp.arange(k, dtype=jnp.int32), (b, n, k)),
            jnp.asarray(False),
            jnp.zeros((b, n), bool),
        )
    fn = functools.partial(_grid_knn_single, k=k, gdim=gdim, m_cap=m_cap_)
    if mask is None:
        vals, idx, ok, row_exact = jax.vmap(lambda cc: fn(cc, None))(coors)
    else:
        vals, idx, ok, row_exact = jax.vmap(fn)(coors, mask)
    return vals, idx, jnp.all(ok), row_exact
