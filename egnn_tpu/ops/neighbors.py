"""Neighborhood selection: masked kNN ranking and adjacency-degree expansion.

Reproduces the reference's exact selection rules (egnn_pytorch.py:230-268,
414-432) with static shapes so everything compiles under jit on TPU:

- masked pairs are filled with 1e5 in the ranking,
- with an adjacency matrix, self pairs are forced to rank -1 and adjacent
  pairs to rank 0 (so they always win the top-k),
- ``only_sparse_neighbors`` sets k to the max row degree and valid_radius to 0
  so only self+adjacent survive the radius mask,
- neighborhood validity is ``ranking <= valid_radius``.

TPU note: ``jax.lax.top_k`` requires a static k. The reference derives k from
``adj_mat.sum(-1).max()`` at runtime (egnn_pytorch.py:249); here that value must
either be supplied statically (``num_nearest_neighbors``) or the adjacency must
be a concrete (non-traced) array so we can read the degree eagerly.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

MASKED_RANK_FILL = 1e5


class Neighborhood(NamedTuple):
    """Static-shape top-k neighborhood of each node.

    ``winner`` is set only by the WIDE packed-candidate path
    (``knn_select_gather(wide=True)``): the arrays then carry kc = k + slack
    slots per row and ``winner`` marks the exact top-k among them (the other
    slots are certificate slack and must be masked out of every aggregation);
    ``valid`` is ``winner & (ranking <= valid_radius)`` there. On the
    ordinary k-wide paths ``winner`` is None."""

    indices: jnp.ndarray  # (b, n, k) int32 neighbor ids (j-dimension)
    ranking: jnp.ndarray  # (b, n, k) the ranking values that won the top-k
    valid: jnp.ndarray    # (b, n, k) bool: ranking <= valid_radius
    winner: Optional[jnp.ndarray] = None  # (b, n, kc) bool, wide path only


def max_degree(adj_mat: jnp.ndarray) -> int:
    """Max row degree of a (possibly batched) boolean adjacency, as a static int.

    Mirrors ``int(adj_mat.float().sum(dim=-1).max().item())``
    (egnn_pytorch.py:249). Must be called on concrete values (outside jit).
    """
    if isinstance(adj_mat, jax.core.Tracer):
        raise ValueError(
            "max_degree() needs a concrete adjacency matrix; under jit, pass "
            "num_nearest_neighbors explicitly (static k is required on TPU)."
        )
    # numpy, not jnp: a concrete adjacency closed over inside jit would
    # otherwise produce tracers (ops on constants are traced), breaking int().
    import numpy as np

    return int(np.asarray(adj_mat, dtype=np.float32).sum(axis=-1).max())


def try_max_degree(adj_mat: jnp.ndarray):
    """max_degree, or None when the adjacency is traced (under jit the caller
    must fall back to an explicitly supplied static k)."""
    if isinstance(adj_mat, jax.core.Tracer):
        return None
    return max_degree(adj_mat)


def knn_ranking(
    rel_dist: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    adj_mat: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Build the (b, n, n) ranking matrix used for neighbor selection.

    ``rel_dist``: (b, n, n) squared distances. Fill order matters and follows
    the reference exactly (mask fill first, then self/-1 and adjacency/0
    overrides — egnn_pytorch.py:238-256).
    """
    ranking = rel_dist
    if mask is not None:
        rank_mask = mask[:, :, None] & mask[:, None, :]
        ranking = jnp.where(rank_mask, ranking, jnp.asarray(MASKED_RANK_FILL, ranking.dtype))
    if adj_mat is not None:
        n = ranking.shape[-1]
        eye = jnp.eye(n, dtype=bool)
        adj = adj_mat.astype(bool) & ~eye
        ranking = jnp.where(eye, jnp.asarray(-1.0, ranking.dtype), ranking)
        ranking = jnp.where(adj, jnp.asarray(0.0, ranking.dtype), ranking)
    return ranking


def select_neighborhood(
    ranking: jnp.ndarray, num_nearest: int, valid_radius: float
) -> Neighborhood:
    """Static-k smallest-ranking selection per row (reference topk largest=False,
    egnn_pytorch.py:258-260). Ties resolve to the lowest index (lax.top_k is
    stable), matching the common torch behavior."""
    neg_vals, indices = jax.lax.top_k(-ranking, num_nearest)
    vals = -neg_vals
    valid = vals <= jnp.asarray(valid_radius, vals.dtype)
    return Neighborhood(indices=indices, ranking=vals, valid=valid)


def knn_select(
    coors: jnp.ndarray,
    num_nearest: int,
    valid_radius: float,
    mask: Optional[jnp.ndarray] = None,
    adj_mat: Optional[jnp.ndarray] = None,
    backend: str = "auto",
    interpret: bool = False,
) -> Neighborhood:
    """End-to-end neighbor selection from coordinates: pairwise squared
    distance -> ranking fills -> static-k selection (egnn_pytorch.py:232-260).

    On TPU this dispatches to the fused Pallas kernels (ops/pallas/knn.py);
    elsewhere (and for tiny graphs) it falls back to the jnp path. See
    ``knn_select_gather`` for the dispatch details and the fused payload
    gather that the EGNN layer uses.
    """
    nbhd, _ = knn_select_gather(
        coors, num_nearest, valid_radius, mask=mask, adj_mat=adj_mat,
        backend=backend, interpret=interpret,
    )
    return nbhd


# Candidate slack for the packed-key selection path: candidates extracted
# beyond k so the exact refine provably covers the true top-k whenever
# keys[kc-1] > keys[k-1] (see ops/pallas/knn.py packed-kernel notes).
CANDIDATE_SLACK = 4

# experiment flag: disable the exactness fallback (NEVER ship False)
_PACKED_FALLBACK = True

# Route backend="auto" through the grid-blocked selection kernel
# (ops/pallas/grid_knn.py) for supported shapes. Flipped True in round 4
# on the measured network-level win (benchmarks/ab_grid.py, v5e, after the
# finalize-tail fixes): depth-3 fwd+bwd n=16384 k=16 20.2 vs 33.9 ms
# (38.9 vs 23.2 M edges/s); n=65536 121.7 vs 390.1 ms (25.8 vs 8.1 M).
# Selection-only: 3.0 vs 7.6 ms at 16k, 14.4 vs 94.2 ms at 65k — certified
# AND bit-exact vs the exact kernels on uniform clouds; the certificate's
# lax.cond fallback keeps non-certifying data (clustered, needle boxes,
# ties at the boundary) exact through the quadratic kernels.
GRID_AUTO = True

# Route backend="auto" WITH a payload through the fused selection+gather
# kernel (ops/pallas/knn.py:knn_select_gather_pallas): the full-band kernel
# keeps the [coors|mask|feats] table resident in VMEM and extracts winner
# rows with one-hot MXU matmuls, eliminating the separate XLA payload gather.
# Flipped True on the round-5 measured win (benchmarks/ab_fused_gather.py,
# v5e, flagship n=1024 k=8 dim=32 mask+adjacency): layer fwd+bwd 150.2 vs
# 174.0 us, depth-3 network fwd+bwd wrt coords 453.7 vs 526.3 us (-14%) —
# despite the fused FORWARD alone measuring slower than select+XLA-gather
# (85.8 vs 44.1 us): the win is the backward (one segment-sum scatter on
# saved indices vs the gather transpose chain XLA builds) plus the removed
# (b,n,k,tw) intermediate. Results bitwise identical (on-chip gate).
# backend="fused" forces it for A/B harnesses.
FUSED_GATHER_AUTO = True

# Minimum n for the grid path's tier-0 WINDOWED repair (x-sorted point
# window instead of a full scan; ops/pallas/knn.py window notes). Below
# this the full-scan repair bucket is already sub-ms and the extra sort +
# cond nesting don't pay. Tests lower it to exercise the tier on CPU.
_WINDOW_REPAIR_MIN_N = 16384

# MEASURED OUTCOME (v5e, n=16384, k=16, the flagship large-n regime): the
# packed candidate kernel alone is ~1.6x faster than the exact full-band
# kernel (4.4-4.8 vs 6.0-7.7 ms), but the exact XLA refine gives the win
# back: the kc-wide gather (+25% rows on an index-bound ~2.1 ms gather), the
# (b,n,k,kc,w) where+sum compaction (fwd+bwd), and rank+top_k add ~3.4 ms —
# a measured net LOSS of ~2 ms/layer on the full layer fwd+bwd (13.6 vs
# 11.2 ms; an optimization_barrier on the compacted block does not help).
# The packed path therefore ships as OPT-IN (backend="packed"), fully
# tested; "auto" uses the exact kernels. Do not re-promote without a layer-
# level fwd+bwd measurement showing a win (benchmarks/ab_layer.py).


def knn_select_gather(
    coors: jnp.ndarray,
    num_nearest: int,
    valid_radius: float,
    mask: Optional[jnp.ndarray] = None,
    adj_mat: Optional[jnp.ndarray] = None,
    payload: Optional[jnp.ndarray] = None,
    backend: str = "auto",
    interpret: bool = False,
    wide: bool = False,
) -> tuple[Neighborhood, Optional[jnp.ndarray]]:
    """Neighbor selection with an optional FUSED payload gather.

    Returns ``(nbhd, gathered)``. When ``payload`` (b, n, w) is given,
    ``gathered`` is the (b, n, k, c [+1 if mask] + w) table rows
    ``[coors | mask | payload]`` at the selected neighbors — the single
    combined gather the EGNN layer needs (gathers are index-bound on TPU, so
    one wide gather beats separate narrow ones ~2x at n=16k). The payload
    gather is differentiable (gradients scatter back through gather_nodes'
    custom VJP); selection itself is stop-gradient.

    Dispatch:
    - ``backend="auto"`` on TPU: the exact full-band / j-tiled kernels.
    - ``backend="packed"`` (opt-in; measured net loss vs exact on the full
      layer at n=16k — see the module note above): the PACKED-key candidate
      kernel (3-op rounds) + exact f32 re-rank of kc = k + CANDIDATE_SLACK
      candidates reusing this same gather. Rows whose truncated-key ties
      could hide a true neighbor are detected exactly
      (keys[kc-1] == keys[k-1]) and the whole call falls back to the exact
      kernel via lax.cond — results are always exact, tie order identical
      to jax.lax.top_k.
    - ``backend="grid"`` (opt-in, 3-D, no adjacency): spatial-grid candidate
      pruning (ops/spatial.py) — O(n * 27 * m_cap) candidates with a
      per-call exactness certificate; on certificate failure the whole call
      lax.conds to the exact kernels. f32 geometry in both branches.
    - CPU/GPU: the jnp reference path (f64-capable, bit-parity with tests).

    ``wide=True`` (only meaningful where a packed path engages): skip the
    k-compaction entirely and return kc-SLOT arrays with a ``winner`` mask
    marking the exact top-k — the consumer aggregates over kc slots with the
    mask applied. This removes the (b, n, k, kc, w) where+sum compaction and
    the (b, n, kc) top_k from the refine (the two measured overheads that
    made the packed path lose at n<=16384 at the layer level); the EGNN
    layer is already mask-driven, so the extra slack slots cost only
    kc/k (~25%) wider elementwise pipeline. Exactness: the winner set is
    derived from the candidate keys — slots with key < keys[k-1] are
    winners outright (monotonic coarse keys: strictly smaller key implies
    strictly smaller exact ranking), and the boundary tie group at
    keys[k-1] is resolved by exact (ranking, column) lex order, which is
    precisely jax.lax.top_k's global tie order. Rows the coverage
    certificate rejects fall back to the exact kernel (winner = first k
    slots). When no packed path engages, the ordinary k-wide result is
    returned with ``winner=None`` — callers branch on it.
    """
    from .pallas.knn import (
        PACKED_MASK_SENTINEL,
        PACKED_MASK_SENTINEL_TILED,
        knn_candidates_packed,
        knn_candidates_packed_tiled,
        knn_select_pallas,
        knn_select_pallas_tiled,
        supports_pallas_knn_packed,
        supports_pallas_knn_packed_tiled,
        supports_pallas_knn_shapes,
    )
    from .core import gather_nodes

    coors_sg = jax.lax.stop_gradient(coors)
    b, n, c = coors.shape
    k = num_nearest

    def build_table():
        parts = [coors]
        if mask is not None:
            parts.append(mask[..., None].astype(coors.dtype))
        if payload is not None:
            parts.append(payload.astype(coors.dtype))
        return jnp.concatenate(parts, axis=-1) if len(parts) > 1 else coors

    on_tpu = jax.default_backend() == "tpu"  # Mosaic kernels are TPU-only
    kernel_ok = n >= 128 and 1 <= k <= 128
    kc = k + CANDIDATE_SLACK

    # Grid routing is resolved FIRST: when GRID_AUTO flips it on for
    # backend="auto", it must take precedence over the packed-tiled branch
    # below or the flip would silently not apply exactly where the grid
    # wins most (n > 16384, where packed-tiled otherwise returns early).
    use_grid = (
        backend == "grid" and adj_mat is None and c == 3 and kernel_ok
    )
    if (not use_grid and backend == "auto" and GRID_AUTO and on_tpu
            and adj_mat is None and c == 3 and kernel_ok):
        from .pallas.grid_knn import supports_grid_knn

        use_grid = supports_grid_knn(n, k)

    use_packed = not use_grid and backend == "packed" and (
        (on_tpu or interpret) and adj_mat is None
        and kernel_ok and n >= 2 * kc
        and (interpret or supports_pallas_knn_packed(n, kc))
    )
    # Beyond the full-band reach (n > ~16384), selection dominates the whole
    # network step (~90% at n=65536) and the refine overhead that kills the
    # packed path's 16k win becomes negligible against the 3-op-round
    # savings on the O(n^2) band — so packed-tiled IS the auto default
    # there (measured: 65k depth-3 network 627 -> 437 ms).
    use_packed_tiled = not use_grid and (backend == "packed_tiled" or (
        backend == "auto" and on_tpu and adj_mat is None and kernel_ok
        and n >= 2 * kc and not supports_pallas_knn_shapes(n)
        and supports_pallas_knn_packed_tiled(n, kc)
    ))

    if use_packed or use_packed_tiled:
        cand_fn = (knn_candidates_packed_tiled if use_packed_tiled
                   else knn_candidates_packed)
        keys, cols = cand_fn(coors_sg, kc, mask=mask, interpret=interpret)
        # Coverage certificate: with fewer than k elements strictly below the
        # true k-th key, keys[k-1] >= key(k-th value); a strictly larger last
        # candidate key then proves every element with key <= keys[k-1] was
        # extracted. A boundary AT the masked-fill sentinel is also safe:
        # that tie group is masked fills only (the sentinel key is disjoint
        # from every real key), whose exact ranking values are all equal, so
        # col-order selection already matches top_k. Any other failing row ->
        # exact-kernel fallback for the whole call.
        sent = (PACKED_MASK_SENTINEL_TILED if use_packed_tiled
                else PACKED_MASK_SENTINEL)
        ok = jnp.all(
            (keys[..., kc - 1] > keys[..., k - 1])
            | (keys[..., k - 1] >= sent)
        )

        def _exact_cands(cc):
            exact_fn = (knn_select_pallas_tiled if use_packed_tiled
                        else knn_select_pallas)
            vals_e, idx_e = exact_fn(
                coors_sg, k, mask=mask, interpret=interpret)
            pad = jnp.full(idx_e.shape[:-1] + (kc - k,), n, jnp.int32)
            return jnp.concatenate([idx_e, pad], axis=-1)

        if _PACKED_FALLBACK:
            cols = jax.lax.cond(ok, lambda cc: cc, _exact_cands, cols)

        # One wide gather of [coors | mask? | payload?] at the kc candidates.
        table = build_table()
        safe_cols = jnp.minimum(cols, n - 1)
        g = gather_nodes(table, safe_cols)           # (b, n, kc, tw), diff
        gj = jax.lax.stop_gradient(g)
        cj = gj[..., :c].astype(jnp.float32)
        ci = coors_sg[:, :, None, :].astype(jnp.float32)
        rank = jnp.sum((ci - cj) ** 2, axis=-1)      # (b, n, kc) f32
        if mask is not None:
            pair_ok = mask[:, :, None] & (gj[..., c] > 0.5)
            rank = jnp.where(pair_ok, rank, jnp.float32(MASKED_RANK_FILL))
        rank = jnp.where(cols >= n, jnp.float32("inf"), rank)

        if wide:
            # ---- winner mask over the kc slots (no top_k, no compaction) --
            # Slots strictly below the k-th candidate's key are winners
            # outright; the boundary tie group resolves by exact
            # (rank, column) lex order = lax.top_k's global tie order
            # (within equal keys, candidate slots are column-ascending).
            kb = keys[..., k - 1 : k]                        # (b, n, 1)
            definite = keys < kb
            group = keys == kb
            t = k - definite.sum(axis=-1, keepdims=True)     # (b, n, 1)
            # lex_less[..., s', s]: group member s' precedes s
            r_sp = rank[..., :, None]                        # (b, n, kc, 1)=s'
            r_s = rank[..., None, :]                         # (b, n, 1, kc)=s
            sl = jnp.arange(kc, dtype=jnp.int32)
            slot_lt = sl[:, None] < sl[None, :]              # (kc, kc) s'<s
            lex_less = (
                group[..., :, None] & group[..., None, :]
                & ((r_sp < r_s) | ((r_sp == r_s) & slot_lt))
            )
            before = lex_less.sum(axis=-2)                   # (b, n, kc)
            winner_packed = definite | (group & (before < t))
            # fallback branch: the exact kernel's cols occupy slots [0, k)
            winner = jnp.where(ok, winner_packed, sl[None, None, :] < k)
            vals = rank.astype(coors.dtype)
            valid = winner & (vals <= jnp.asarray(valid_radius, vals.dtype))
            nbhd = Neighborhood(indices=safe_cols, ranking=vals, valid=valid,
                                winner=winner)
            return nbhd, (g if payload is not None else None)

        neg, order = jax.lax.top_k(-rank, k)
        vals = (-neg).astype(coors.dtype)
        # Slot-select the k winners out of the kc candidates with exact
        # elementwise where+sum reductions over the small kc axis (measured:
        # beats both take_along_axis ~5x and a HIGHEST-precision one-hot
        # einsum on the (b, n, kc, w) block; bf16-pass matmuls would round
        # the gathered geometry, so a DEFAULT-precision einsum is not
        # admissible here).
        oh = order[..., None] == jnp.arange(kc)[None, None, None, :]  # (b,n,k,kc)
        idx = jnp.max(
            jnp.where(oh, safe_cols[:, :, None, :], 0), axis=-1
        ).astype(jnp.int32)
        valid = vals <= jnp.asarray(valid_radius, vals.dtype)
        nbhd = Neighborhood(indices=idx, ranking=vals, valid=valid)
        if payload is None:
            return nbhd, None
        gathered = jnp.sum(
            jnp.where(oh[..., None], g[:, :, None, :, :], jnp.zeros((), g.dtype)),
            axis=3,
        )                                            # (b, n, k, tw)
        # Materialize the compacted block once: without the barrier XLA fuses
        # the kc-axis reduction into every downstream consumer (rel, proj_j,
        # mask slice, ...), multiplying its cost several-fold in the layer.
        gathered = jax.lax.optimization_barrier(gathered)
        return nbhd, gathered

    # Spatial-grid candidate pruning (use_grid resolved ABOVE the packed
    # branch, 3-D only): O(n * 27 * m_cap) candidates instead of the
    # O(n^2) ranking band, with a per-call exactness certificate;
    # certificate failure lax.conds to the exact kernels, so results are
    # always the exact masked selection (f32 geometry; see ops/spatial.py
    # for the certificate and its limits).
    # Exact-selection routing, shared by the dispatch tail below and the
    # grid certificate's lax.cond fallback — ONE copy of the pallas/tiled/
    # jnp choice (the jnp arm stays dtype-native so CPU/f64 tie order is
    # identical wherever it runs).
    use_pallas = backend == "pallas" or (
        backend in ("auto", "grid") and on_tpu and kernel_ok
        and supports_pallas_knn_shapes(n)
    )
    # Beyond the full-band kernel's VMEM reach (n > ~8k), the j-tiled variant
    # keeps selection on-chip with O(TI*TJ) memory — measured 40x vs the XLA
    # distance-matrix + top_k fallback at n=16384 (5.7 ms vs 229 ms, v5e).
    use_tiled = backend == "tiled" or (
        backend in ("auto", "grid") and on_tpu and kernel_ok
        and not supports_pallas_knn_shapes(n)
    )

    def _exact_selection():
        """(vals, idx) by the exact kernels / jnp path (dtype-native)."""
        if use_pallas or use_tiled:
            fn = knn_select_pallas if use_pallas else knn_select_pallas_tiled
            return fn(coors_sg, num_nearest, mask=mask, adj_mat=adj_mat,
                      interpret=interpret)
        _, rel_dist = pairwise_geometry(coors_sg)
        ranking = knn_ranking(rel_dist, mask=mask, adj_mat=adj_mat)
        neg_vals, idx_e = jax.lax.top_k(-ranking, num_nearest)
        return -neg_vals, idx_e

    def _packed_tiled_vals_idx():
        """k-compacted (vals f32, idx) via packed-tiled candidates + exact
        refine — the same certified machinery the auto default uses beyond
        n=16384, mirrored (without the payload fusion) so the grid
        certificate's fallback costs what plain auto costs there instead
        of the ~1.3x-slower exact tiled kernel."""
        keys, cols = knn_candidates_packed_tiled(
            coors_sg, kc, mask=mask, interpret=interpret)
        okp = jnp.all(
            (keys[..., kc - 1] > keys[..., k - 1])
            | (keys[..., k - 1] >= PACKED_MASK_SENTINEL_TILED)
        )

        def _exact_cands(cc):
            vals_e, idx_e = knn_select_pallas_tiled(
                coors_sg, k, mask=mask, interpret=interpret)
            pad = jnp.full(idx_e.shape[:-1] + (kc - k,), n, jnp.int32)
            return jnp.concatenate([idx_e, pad], axis=-1)

        cols = jax.lax.cond(okp, lambda cc: cc, _exact_cands, cols)
        safe_cols = jnp.minimum(cols, n - 1)
        tbl = coors_sg.astype(jnp.float32)
        if mask is not None:
            tbl = jnp.concatenate(
                [tbl, mask[..., None].astype(jnp.float32)], axis=-1)
        gj = jax.lax.stop_gradient(gather_nodes(tbl, safe_cols))
        ci = coors_sg[:, :, None, :].astype(jnp.float32)
        rank = jnp.sum((ci - gj[..., :c]) ** 2, axis=-1)
        if mask is not None:
            pair_ok = mask[:, :, None] & (gj[..., c] > 0.5)
            rank = jnp.where(pair_ok, rank, jnp.float32(MASKED_RANK_FILL))
        rank = jnp.where(cols >= n, jnp.float32("inf"), rank)
        neg, order = jax.lax.top_k(-rank, k)
        oh = order[..., None] == jnp.arange(kc)[None, None, None, :]
        idx = jnp.max(
            jnp.where(oh, safe_cols[:, :, None, :], 0), axis=-1
        ).astype(jnp.int32)
        return -neg, idx

    # Inside the certificate's lax.cond, XLA places the branch OUTPUTS in
    # VMEM on top of the kernel's scoped allocation — at n=16384 the
    # full-band kernel's band+iota is exactly 16 MB, so adding the
    # (n, k) vals+idx blocks OOMs scoped vmem (hit on-chip, round 4). The
    # fallback therefore needs output headroom beyond bare kernel support.
    n_pad_fb = -(-n // 128) * 128
    full_band_fb_ok = (
        supports_pallas_knn_shapes(n)
        and 128 * n_pad_fb * 8 + 2 * n_pad_fb * num_nearest * 4
        <= 16 * 1024 * 1024
    )
    grid_fb_packed = (
        on_tpu and adj_mat is None and kernel_ok and n >= 2 * kc
        and not full_band_fb_ok
        and supports_pallas_knn_packed_tiled(n, kc)
    )

    if use_grid:
        from .pallas.grid_knn import grid_knn_select_pallas, supports_grid_knn
        from .pallas.knn import (knn_select_queries_pallas,
                                 supports_pallas_knn_queries)
        from .spatial import grid_knn_select

        if supports_grid_knn(n, k, backend="tpu" if (on_tpu or interpret)
                             else None):
            gvals, gidx, gok, grow_exact = grid_knn_select_pallas(
                coors_sg, k, mask=mask, interpret=interpret)
        else:
            gvals, gidx, gok, grow_exact = grid_knn_select(
                coors_sg, k, mask=mask)

        def _take_grid(_):
            return gvals, gidx

        def _exact_fallback(_):
            if grid_fb_packed:
                v, i = _packed_tiled_vals_idx()
            elif use_pallas and not full_band_fb_ok:
                # full-band kernel support without cond-output headroom
                # (and packed-tiled unsupported): the j-tiled exact kernel
                v, i = knn_select_pallas_tiled(
                    coors_sg, num_nearest, mask=mask, adj_mat=adj_mat,
                    interpret=interpret)
            else:
                v, i = _exact_selection()
            return v.astype(jnp.float32), i.astype(jnp.int32)

        # ---- bucketed per-row repair -----------------------------------
        # Equal-mass binning makes HETEROGENEOUS cells (ops/spatial.py):
        # realistic clustered clouds certify all but a boundary sliver of
        # rows (measured on-chip: 3.3% on a 16k Gaussian, 4.3% at 65k — a
        # wide tail cell next to a narrow core cell gives d_k > margin). A
        # whole-call fallback would pay the full O(n^2) exact kernel for
        # that sliver; instead recompute ONLY the failing rows, padded to
        # a static bucket, with the asymmetric query-vs-points kernel
        # (O(R*n), bitwise the exact kernel's rows — so the bucket may pad
        # with already-certified rows, whose overwrite is a no-op). TWO
        # bucket tiers: n/16 covers the measured Gaussian rates with ~1.5x
        # headroom at half the repair cost of a single n/8 bucket (the
        # band is static — the small tier is what the common case pays);
        # n/4 is the middle backstop before the whole-call exact fallback
        # (which also absorbs overflow/early-exit, where row_exact is
        # all-False by construction).
        can_repair = (
            (on_tpu or interpret)
            and supports_pallas_knn_queries(n)
        )
        # tier-0 WINDOWED repair (round 5): failing rows re-rank against a
        # W-wide x-sorted point window instead of all n points — O(R*W),
        # measured 2.1 vs 7.7 ms at R=4096/n=65536/k=16
        # (ops/pallas/knn.py window notes). Each repaired row carries its
        # own x-margin certificate; rows it cannot certify tier up to the
        # full-scan bucket. Gated at n >= 16384: below that the full-scan
        # repair is already sub-ms and the extra sort+conds don't pay.
        from .pallas.knn import (knn_select_window_pallas,
                                 supports_pallas_knn_window)

        win_W = min(-(-(n // 4) // 128) * 128, -(-n // 128) * 128)
        can_window = (
            can_repair and n >= _WINDOW_REPAIR_MIN_N
            and supports_pallas_knn_window(n, win_W)
        )
        if can_repair:
            bad = ~grow_exact                                   # (b, n)
            nbad = bad.sum(axis=1)

            def _repair_with(R, bad_map=None, base=None):
                """Full-scan repair of ``bad_map`` rows (bucket size R) on
                top of ``base`` (vals, idx) arrays."""
                bm = bad if bad_map is None else bad_map

                def _repair(_):
                    bv, bi = (gvals, gidx) if base is None else base
                    _, fidx = jax.lax.top_k(bm.astype(jnp.float32), R)
                    q = jnp.take_along_axis(
                        coors_sg.astype(jnp.float32), fidx[..., None],
                        axis=1)
                    qm = (jnp.take_along_axis(mask, fidx, axis=1)
                          if mask is not None else None)
                    rv, ri = knn_select_queries_pallas(
                        q, coors_sg, k, q_mask=qm, p_mask=mask,
                        interpret=interpret)
                    vv = jax.vmap(lambda a, i2, u: a.at[i2].set(u))(
                        bv, fidx, rv)
                    ii = jax.vmap(lambda a, i2, u: a.at[i2].set(u))(
                        bi, fidx, ri)
                    return vv, ii
                return _repair

            r_small = min(n, max(128, n // 16))  # 128 = one lane tile
            r_tiny = min(n, max(128, n // 64))   # window tier-up cascade
            r_mid = min(n, max(128, n // 32))    # cascade spill level
            r_3q = min(n, max(128, (3 * n) // 64))  # exact-fit ladder top
            r_big = min(n, max(256, n // 4))

            def _window_tier(_):
                """Tier 0: windowed repair of <= r_small rows; rows whose
                window certificate fails tier up to one full-scan bucket
                (rare — only rows whose kth neighbor sits beyond the W-wide
                x-mass window)."""
                c32 = coors_sg.astype(jnp.float32)
                inf = jnp.float32("inf")
                xkey = (jnp.where(mask, c32[..., 0], inf)
                        if mask is not None else c32[..., 0])
                order = jnp.argsort(xkey, axis=1).astype(jnp.int32)  # (b, n)
                pts_s = jnp.take_along_axis(c32, order[..., None], axis=1)
                pm_s = (jnp.take_along_axis(mask, order, axis=1)
                        if mask is not None else None)
                # x-rank of every node = inverse permutation of the sort
                rank = jnp.zeros((b, n), jnp.int32)
                rank = jax.vmap(lambda rr, oo: rr.at[oo].set(
                    jnp.arange(n, dtype=jnp.int32)))(rank, order)
                # bucket: bad rows first, sorted by x-rank (tile-local
                # windows then cover tile neighbors); pad rows are good
                # rows whose overwrite is conditioned away below
                bigr = jnp.int32(2 * n)
                badkey = jnp.where(bad, rank, bigr + rank)
                negk, fidx = jax.lax.top_k(-badkey, r_small)     # (b, R)
                q = jnp.take_along_axis(c32, fidx[..., None], axis=1)
                qranks = jnp.take_along_axis(rank, fidx, axis=1)
                rv, ri, rmargin = knn_select_window_pallas(
                    q, qranks, pts_s, order, k, win_W,
                    p_mask_sorted=pm_s, interpret=interpret)
                win_ok = rv[:, :, k - 1] < rmargin * rmargin
                if mask is not None:
                    win_ok = win_ok & (
                        rv[:, :, k - 1] < jnp.float32(MASKED_RANK_FILL))
                row_bad = jnp.take_along_axis(bad, fidx, axis=1)
                apply_row = row_bad & win_ok                     # (b, R)
                old_v = jnp.take_along_axis(gvals, fidx[..., None], axis=1)
                old_i = jnp.take_along_axis(gidx, fidx[..., None], axis=1)
                uv = jnp.where(apply_row[..., None], rv, old_v)
                ui = jnp.where(apply_row[..., None], ri, old_i)
                vv = jax.vmap(lambda a, i2, u: a.at[i2].set(u))(
                    gvals, fidx, uv)
                ii = jax.vmap(lambda a, i2, u: a.at[i2].set(u))(
                    gidx, fidx, ui)
                fixed = jnp.zeros((b, n), bool)
                fixed = jax.vmap(lambda a, i2, u: a.at[i2].set(u))(
                    fixed, fidx, apply_row)
                still_bad = bad & ~fixed
                nbad2 = still_bad.sum(axis=1)

                def _done(_):
                    return vv, ii

                # Tier-up CASCADE: a single window-certificate failure must
                # not re-pay the whole r_small full-scan bucket on top of
                # the window pass (measured 65k Gaussian: that all-or-
                # nothing cond put selection at 26.4 ms vs the pre-window
                # 22.7). Window-failed rows are a thin margin sliver —
                # re-rank them in an n/64 bucket (4x cheaper than r_small)
                # and keep r_small only as the spill.
                def _spill(_):
                    # measured 65k Gaussian: still_bad ~ 1015 vs
                    # r_tiny=1024 — one unlucky cloud away from the n/64
                    # bucket overflowing; an n/32 mid level halves that
                    # spill's cost vs jumping straight to r_small.
                    return jax.lax.cond(
                        jnp.all(nbad2 <= r_mid),
                        _repair_with(r_mid, bad_map=still_bad,
                                     base=(vv, ii)),
                        _repair_with(r_small, bad_map=still_bad,
                                     base=(vv, ii)),
                        None)

                def _cascade(_):
                    return jax.lax.cond(
                        jnp.all(nbad2 <= r_tiny),
                        _repair_with(r_tiny, bad_map=still_bad,
                                     base=(vv, ii)),
                        _spill, None)

                return jax.lax.cond(jnp.all(nbad2 == 0), _done, _cascade,
                                    None)

            tier0 = _window_tier if can_window else _repair_with(r_small)

            # PRE-tier exact-fit LADDER: direct full-scan buckets at n/64
            # granularity ahead of the window tier. Measured (65k Gaussian,
            # benchmarks/diag_window.py): the full-scan queries kernel is
            # LINEAR in R (1.93 ms at R=n/64, 7.66 at n/16 — 1.9 ms per
            # n/64 rows), while the window path pays 1.2 ms prep + 3.3 ms
            # kernel + a ~1.9 ms cascade when margins fail in the Gaussian
            # core (only ~63% of bad rows certify there — the W=n/4 x-mass
            # window is intrinsically thinner than r_k). Direct repair
            # therefore WINS for nbad <= 3n/64 (5.75 vs 6.4 ms at the
            # measured cloud) and removes the still_bad~r_tiny cascade
            # cliff; the window tier keeps only the (3n/64, n/16] band.
            def _tier0(_):
                def _le_mid(_):
                    return jax.lax.cond(
                        jnp.all(nbad <= r_tiny), _repair_with(r_tiny),
                        _repair_with(r_mid), None)

                def _gt_mid(_):
                    return jax.lax.cond(
                        jnp.all(nbad <= r_3q), _repair_with(r_3q),
                        tier0, None)

                return jax.lax.cond(
                    jnp.all(nbad <= r_mid), _le_mid, _gt_mid, None)

            def _mid(_):
                return jax.lax.cond(
                    jnp.all(nbad <= r_big), _repair_with(r_big),
                    _exact_fallback, None)

            def _not_ok(_):
                return jax.lax.cond(
                    jnp.all(nbad <= r_small), _tier0,
                    _mid, None)

            vals, indices = jax.lax.cond(gok, _take_grid, _not_ok, None)
        else:
            vals, indices = jax.lax.cond(gok, _take_grid, _exact_fallback,
                                         None)

        vals = vals.astype(coors.dtype)
        valid = vals <= jnp.asarray(valid_radius, vals.dtype)
        nbhd = Neighborhood(indices=indices, ranking=vals, valid=valid)
        gathered = (gather_nodes(build_table(), nbhd.indices)
                    if payload is not None else None)
        return nbhd, gathered

    # ---- fused selection + payload gather (opt-in / FUSED_GATHER_AUTO) ----
    # One kernel pass: full-band selection with the payload table resident
    # in VMEM, winner rows extracted by one-hot MXU matmuls (bit-exact with
    # gather_nodes under HIGHEST). Backward = the same segment-sum scatter
    # gather_nodes' VJP uses, on the saved indices; selection itself stays
    # stop-gradient. Engages only where the plain full-band kernel would
    # (same ranking semantics incl. adjacency), table fits VMEM, and a
    # payload is present.
    if payload is not None and (use_pallas or backend == "fused"):
        from .pallas.knn import (knn_select_gather_pallas,
                                 supports_pallas_knn_gather)

        table = build_table()
        tw = table.shape[-1]
        want_fused = backend == "fused" or (
            backend == "auto" and FUSED_GATHER_AUTO)
        if (want_fused and (on_tpu or interpret) and kernel_ok
                and supports_pallas_knn_gather(n, tw, k)):

            @jax.custom_vjp
            def _fused(tbl):
                v, i, gg = knn_select_gather_pallas(
                    coors_sg, k, tbl, mask=mask, adj_mat=adj_mat,
                    interpret=interpret)
                return jax.lax.stop_gradient(v), jax.lax.stop_gradient(i), gg

            def _fused_fwd(tbl):
                out = _fused(tbl)
                return out, out[1]

            def _fused_bwd(idx_res, ct):
                from .segment import batched_segment_sum

                dg = ct[2]
                dv = batched_segment_sum(
                    dg.reshape(b, -1, tw), idx_res.reshape(b, -1), n)
                return (dv.astype(table.dtype),)

            _fused.defvjp(_fused_fwd, _fused_bwd)
            vals, indices, gathered = _fused(table)
            vals = vals.astype(coors.dtype)
            valid = vals <= jnp.asarray(valid_radius, vals.dtype)
            nbhd = Neighborhood(indices=indices, ranking=vals, valid=valid)
            return nbhd, gathered

    if use_pallas or use_tiled:
        vals, indices = _exact_selection()
        vals = vals.astype(coors.dtype)
        valid = vals <= jnp.asarray(valid_radius, vals.dtype)
        nbhd = Neighborhood(indices=indices, ranking=vals, valid=valid)
    else:
        _, rel_dist = pairwise_geometry(coors_sg)
        ranking = knn_ranking(rel_dist, mask=mask, adj_mat=adj_mat)
        nbhd = select_neighborhood(ranking, num_nearest, valid_radius)

    gathered = None
    if payload is not None:
        gathered = gather_nodes(build_table(), nbhd.indices)
    return nbhd, gathered


def expand_adjacency_degrees(
    adj_mat: jnp.ndarray, num_adj_degrees: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Nth-degree adjacency expansion with per-degree labels.

    Mirrors EGNN_Network's expansion loop (egnn_pytorch.py:420-428) EXACTLY,
    including its relabeling quirk: the reference computes
    ``(nxt.float() - adj.float()).bool()`` — nonzero difference, i.e. XOR —
    so pairs that are in ``adj`` but NOT in the 2-step reachability set
    (difference -1) are ALSO relabeled to the higher degree. On a chain
    graph, first-degree edges are not 2-step reachable, so they end up
    labeled degree 2. Quirky, but parity demands it (caught by
    test_parity_adjacency_degree_quirk with large init_eps).
    The expanded adjacency REPLACES rather than unions (``adj = nxt``),
    matching egnn_pytorch.py:427; it therefore gains self-loops (i->j->i).
    The loop is a static Python loop (num_adj_degrees is config).
    """
    adj = adj_mat.astype(bool)
    adj_indices = adj.astype(jnp.int32)
    for ind in range(num_adj_degrees - 1):
        degree = ind + 2
        nxt = (adj.astype(jnp.float32) @ adj.astype(jnp.float32)) > 0
        new_mask = nxt ^ adj  # reference: (nxt - adj).bool() == XOR
        adj_indices = jnp.where(new_mask, degree, adj_indices)
        adj = nxt
    return adj, adj_indices


def khop_neighbor_lists(
    nbr: jnp.ndarray,
    nbr_mask: Optional[jnp.ndarray],
    num_degrees: int,
    cap_out: Optional[int] = None,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Sparse k-hop adjacency expansion on padded neighbor lists.

    The scalable analog of :func:`expand_adjacency_degrees` / the notebook's
    torch-sparse ``spspmm`` variant of ``nth_deg_adjacency``
    (examples/egnn_test.ipynb cell 39): no (n, n) buffer, no dense boolean
    matmul — O(n * cap) memory with static shapes throughout, so it scales
    to 65k-node clouds where the dense expansion would need gigabytes.

    Args:
      nbr: (n, c0) int32 — for each node, ids of its 1-hop neighbors
        (receiver-major padded neighbor lists, the layout every kNN builder
        emits per row; ``EdgeSet`` rows reshape to this when uniform).
      nbr_mask: (n, c0) bool, False = padding slot; None = all valid.
      num_degrees: D — expand reachability to D hops.
      cap_out: static per-row output capacity (default
        min(n-1, c0 + c0**2 + ... + c0**D), the worst-case ball size).
        Rows whose reachable set exceeds it are truncated (lowest ids
        kept) — pick cap_out generously.

    Returns (ids (n, cap_out) int32, degrees (n, cap_out) int32, mask
    (n, cap_out) bool): per node, the nodes reachable in 1..D hops along
    the DIRECTED lists, labeled with their MINIMUM hop count, self
    excluded. These are the clean BFS semantics — deliberately NOT the
    reference's XOR-relabel quirk or its self-loop gain
    (egnn_pytorch.py:420-428); that quirk is parity-pinned in
    ``expand_adjacency_degrees``, which remains the dense parity path.

    Design note (TPU idiom): per-hop frontier expansion is one row gather
    ((n, W) -> (n, W, c0)); dedup-with-min-degree packs (id, degree) into a
    single int32 key and runs ONE lane-axis sort per hop — first occurrence
    of each id after sorting carries its minimum degree. Compaction back to
    the static cap is an argsort by (dropped, position). Sorts are
    XLA-native and O(W log W) per row; no scatter anywhere.
    """
    n, c0 = nbr.shape
    if num_degrees < 1:
        raise ValueError("num_degrees must be >= 1")
    if cap_out is None:
        cap_out = min(n - 1, sum(c0 ** d for d in range(1, num_degrees + 1)))
    D = num_degrees
    big = D + 1                        # degree sentinel for invalid slots
    stride = big + 1                   # key = id * stride + degree
    assert (n + 1) * stride < 2**31, "id*degree key must fit int32"
    sentinel = jnp.int32(n)            # invalid-id sentinel (sorts last)
    rows = jnp.arange(n, dtype=jnp.int32)[:, None]

    # padded gather table: row n = all-sentinel (so expanding an invalid
    # slot yields only invalid candidates)
    if nbr_mask is None:
        nbr_v = nbr.astype(jnp.int32)
    else:
        nbr_v = jnp.where(nbr_mask, nbr.astype(jnp.int32), sentinel)
    table = jnp.concatenate(
        [nbr_v, jnp.full((1, c0), sentinel, jnp.int32)], axis=0)

    def _dedup_compact(ids, deg, cap):
        """Sort by (id, deg); keep first occurrence of each real, non-self
        id; compact survivors to the front; slice to cap."""
        key = ids * stride + deg
        skey = jnp.sort(key, axis=1)
        sids = skey // stride
        sdeg = skey % stride
        first = jnp.concatenate(
            [jnp.ones((n, 1), bool), sids[:, 1:] != sids[:, :-1]], axis=1)
        keep = first & (sids < n) & (sids != rows) & (sdeg <= D)
        w = sids.shape[1]
        pos = jnp.arange(w, dtype=jnp.int32)[None, :]
        order = jnp.argsort(jnp.where(keep, pos, w + pos), axis=1)
        sids = jnp.take_along_axis(sids, order, axis=1)[:, :cap]
        sdeg = jnp.take_along_axis(sdeg, order, axis=1)[:, :cap]
        kept = jnp.take_along_axis(keep, order, axis=1)[:, :cap]
        return (jnp.where(kept, sids, sentinel),
                jnp.where(kept, sdeg, big), kept)

    ids = nbr_v
    deg = jnp.where(nbr_v < n, jnp.int32(1), big)
    ids, deg, mask_out = _dedup_compact(ids, deg, min(cap_out, c0))
    for d in range(2, D + 1):
        # frontier = exactly the ids first reached at the previous hop
        src = jnp.where(deg == d - 1, ids, sentinel)
        cand = jnp.take(table, src, axis=0)             # (n, W, c0)
        cand_ids = cand.reshape(n, -1)
        cand_deg = jnp.where(cand_ids < n, jnp.int32(d), big)
        ids = jnp.concatenate([ids, cand_ids], axis=1)
        deg = jnp.concatenate([deg, cand_deg], axis=1)
        ids, deg, mask_out = _dedup_compact(ids, deg, cap_out)
    return ids, jnp.where(mask_out, deg, 0), mask_out


def pairwise_geometry(coors: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """All-pairs relative coordinates and squared distances.

    ``coors``: (b, n, c) -> rel_coors (b, n, n, c) = x_i - x_j and
    rel_dist (b, n, n) = ||x_i - x_j||^2 (squared, no sqrt — egnn_pytorch.py:232-233).
    """
    rel_coors = coors[:, :, None, :] - coors[:, None, :, :]
    rel_dist = jnp.sum(rel_coors**2, axis=-1)
    return rel_coors, rel_dist
