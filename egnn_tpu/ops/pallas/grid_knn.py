"""Grid-blocked kNN selection: a Pallas kernel over spatial-cell candidate
bands.

The quadratic kernels in ops/pallas/knn.py are AT the VPU roofline — at
n=16384 the full-band kernel scans all n^2 pairs in ~6 ms because that is
simply how many ops the band contains. The only way past that floor is
structural: rank fewer candidates. This kernel processes nodes GROUPED BY
SPATIAL CELL (the ops/spatial.py grid), so every query row in a program
shares the same 27 neighbor-cell candidate blocks:

- per-row gathers (the thing TPUs cannot do fast) never happen: the 27
  candidate blocks are dynamic 8-row-aligned sublane slices of a small
  VMEM-resident table, shared by all m_cap=128 queries of the cell;
- the ranking band is (128, 27*128=3456) instead of (128, n) — a ~n/3456
  op reduction (4.7x at n=16k, 19x at 65k) on the distance fill and the k
  extraction rounds that dominate;
- extraction selects by LEXICOGRAPHIC (distance, global id): the table's
  spare sublane row carries each slot's global id as f32 (exact to 2^24),
  and each round takes min-distance then min-gid among the tied — the
  selected SET therefore matches jax.lax.top_k exactly even through f32
  distance collisions. Without this, collision ties at the k-boundary
  (measured ~1.5e-5/row on uniform 16k clouds — most calls at 65k) would
  have to be certificate-rejected; with it, no tie component is needed.

Exactness is still certified per ROW (ops/spatial.py discipline):
coverage margin (shaved, strict), cell overflow, candidate count, and
the masked-fill regime (vkth < 1e5 under a mask). Binning is EQUAL-MASS
per axis (ops/spatial.py:cell_assignment), so clustered clouds don't
overflow; the rows that still fail (heterogeneous-cell margin boundaries,
~3% on a 16k Gaussian) are recomputed by ops/neighbors.py's bucketed
per-row repair (asymmetric query kernel, O(R*n)) instead of a whole-call
exact fallback — which remains as the lax.cond backstop when failures
exceed the bucket. A cheap EARLY exit (overflow / candidate count, known
before any table is built) skips the kernel entirely when it cannot
certify at all.

Layout notes (Mosaic constraints, see CLAUDE.md gotchas):
- candidate table: ((G+1)*8, m_cap) f32, row 8*c+cc = coordinate cc of
  cell c, row 8*c+3 = global ids as f32 — dynamic sublane slices must be
  8-row aligned, so each cell owns a full 8-row group (rows 4..7 unused).
  Empty slots hold BOX-RELATIVE sentinel coordinates (hi + 10*diag + 1,
  see _grid_knn_main — provably never outrank a real candidate at any
  data scale) and gid n (sorts after every real id).
- query table: (G+1, m_cap, 4) f32 streamed one cell per program via the
  BlockSpec index map (slots on sublanes, coords on lanes — the same
  orientation trick as the quadratic kernels' (n, c) x (c, n) pair).
- neighbor cell ids: decoded arithmetically from program_id inside the
  kernel (both variants) — an SMEM (rows, 27) table block trips Mosaic's
  8-sublane divisibility rule on-chip.

Reference behavior mirrored: self IS a candidate (egnn_pytorch.py:258);
masked nodes are excluded from the tables and masked query rows get the
1e5-fill rows outside the kernel (ops/neighbors.py knn_select semantics).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..spatial import _neighbor_cells, cell_assignment, resort_and_certify

_LANE = 128
M_CAP = 128          # slots per cell == one lane tile (alignment-free)
_EVICT_FILL = 3.4e38
# Scale guard for the box-relative sentinel argument below: coordinates
# and box diagonals beyond this are early-rejected (squares would approach
# f32 infinity and the sentinel separation bound would stop holding).
_SCALE_MAX = 1e15

# Mean-occupancy target: high enough that slot padding stays ~2x (the band
# is 27*M_CAP wide regardless), low enough that the Poisson tail never
# overflows M_CAP=128 slots on uniform data: P(X > 128 | 64) ~ 5e-12 per
# cell. gdim rounding drifts actual occupancy to ~64-96; overflow (e.g.
# clustered data) is caught by the EARLY certificate before any kernel work.
_OCC_TARGET = 64.0
# Reject shapes whose rounded grid drifts the mean occupancy above this:
# P(X > 128 | 96) ~ 8e-4 per cell makes whole-call fallback likely.
_OCC_MAX = 96.0


def grid_kernel_gdim(n: int) -> int:
    """Static cells-per-axis for the kernel's occupancy model."""
    return max(4, int(round((n / _OCC_TARGET) ** (1.0 / 3.0))))


# Resident-table variant: the whole ((G+1)*8, m_cap) candidate table lives
# in VMEM and neighbor blocks are dynamic sublane slices. Beyond this
# budget the STREAMED variant takes over: candidate blocks are DMA'd per
# (cell, neighbor) grid step through arithmetic BlockSpec index maps — no
# VMEM table at all, ~2 MB scratch at any n (27x redundant HBM reads of
# the 4 KB blocks are negligible next to the band compute).
_RESIDENT_TABLE_MAX = 5 * 1024 * 1024
# Cell-count backstop for the streamed variant (grid steps = 27x this, so
# G=2^15 means ~885k sequential (128,128)-tile programs — per-step dispatch
# overhead there is UNMEASURED; revisit the bound on-chip before relying
# on n beyond ~3M).
_STREAMED_MAX_CELLS = 2 ** 15


def _grid_resident_ok(gdim: int) -> bool:
    return (gdim ** 3 + 1) * 8 * M_CAP * 4 <= _RESIDENT_TABLE_MAX


def supports_grid_knn(n: int, k: int, backend: Optional[str] = None) -> bool:
    """Kernel applicability: TPU, band-width win, occupancy in the safe
    window, and either the resident-table or the streamed variant viable."""
    if backend is None:
        backend = jax.default_backend()
    gdim = grid_kernel_gdim(n)
    G = gdim ** 3
    return (
        backend == "tpu"
        and 1 <= k <= M_CAP
        and n >= 8192                      # below: exact kernels already win
        and n / G <= _OCC_MAX
        and (_grid_resident_ok(gdim) or G <= _STREAMED_MAX_CELLS)
    )


def _dist_block(q, blk, m_cap):
    """(m_cap, m_cap) squared distances: q (m_cap, 4) slots-on-sublanes vs
    blk (8, m_cap) slots-on-lanes (rows x, y, z, gid)."""
    d = jnp.zeros((m_cap, m_cap), jnp.float32)
    for cc in range(3):
        qi = q[:, cc].reshape(m_cap, 1)
        xj = blk[cc, :].reshape(1, m_cap)
        dd = qi - xj
        d = d + dd * dd
    return d


def _lex_topk(band, gband, k, n):
    """k rounds of lex (distance, gid) min / evict over band (m_cap, W)
    with gband (1, W) f32 global ids (broadcast, never materialized wide).
    Real gids are unique, so the winner mask selects exactly one slot per
    round; only all-sentinel rows (fewer than k real candidates —
    certificate-rejected outside) can multi-evict.
    Returns ((m_cap, k) f32 vals, (m_cap, k) int32 gids)."""
    gid_sent = float(n)
    vals, gids = [], []
    for _ in range(k):
        m = jnp.min(band, axis=1, keepdims=True)
        at_m = band == m
        g = jnp.min(jnp.where(at_m, gband, gid_sent), axis=1, keepdims=True)
        vals.append(m)
        gids.append(g)
        band = jnp.where(at_m & (gband == g), _EVICT_FILL, band)
    return (jnp.concatenate(vals, axis=1),
            jnp.concatenate(gids, axis=1).astype(jnp.int32))


def _grid_knn_kernel(cand_ref, q_ref, vals_ref, gid_ref,
                     *, k: int, m_cap: int, n: int, gdim: int):
    """One spatial cell per program: rank the 27-block candidate band for
    the cell's m_cap query slots; emit top-k (vals, global ids) selected by
    lexicographic (distance, gid) — jax.lax.top_k's exact set and content
    even through f32 distance ties.

    Neighbor cell ids are decoded ARITHMETICALLY from program_id (the same
    decode as the streamed variant's index map): an SMEM neighbor table
    would need a (rows, 27) block whose row count Mosaic rejects unless
    8-divisible (hit on-chip in round 4 — interpret mode does not enforce
    the sublane rule)."""
    G = gdim ** 3
    g2 = gdim * gdim
    c = pl.program_id(0)
    ix = c // g2
    iy = (c // gdim) % gdim
    iz = c % gdim
    q = q_ref[0]                                    # (m_cap, 4)
    dblocks, gblocks = [], []
    for j in range(27):
        dx, dy, dz = j // 9 - 1, (j // 3) % 3 - 1, j % 3 - 1
        nx, ny, nz = ix + dx, iy + dy, iz + dz
        inb = ((nx >= 0) & (nx < gdim) & (ny >= 0) & (ny < gdim)
               & (nz >= 0) & (nz < gdim))
        cell = jnp.where(inb, (nx * gdim + ny) * gdim + nz, G)
        r0 = pl.multiple_of(cell * 8, 8)
        blk = cand_ref[pl.ds(r0, 8), :]             # (8, m_cap): x,y,z,gid
        dblocks.append(_dist_block(q, blk, m_cap))
        gblocks.append(blk[3, :].reshape(1, m_cap))
    band = jnp.concatenate(dblocks, axis=1)         # (m_cap, 27*m_cap)
    gband = jnp.concatenate(gblocks, axis=1)        # (1, 27*m_cap)

    vals, gids = _lex_topk(band, gband, k, n)
    vals_ref[0] = vals
    gid_ref[0] = gids


def _grid_knn_streamed_kernel(cand_blk_ref, q_ref, vals_ref, gid_ref,
                              band, gband, *, k: int, m_cap: int, n: int):
    """Streamed variant: grid (G, 27); each step's BlockSpec index map
    already fetched THE neighbor block (arithmetic cell decoding, no table
    in VMEM). Deposits one (m_cap, m_cap) distance tile into the band
    scratch; extraction runs once at the last neighbor."""
    j = pl.program_id(1)
    q = q_ref[0]                                    # (m_cap, 4)
    blk = cand_blk_ref[0]                           # (8, m_cap)
    off = pl.multiple_of(j * m_cap, m_cap)
    band[:, pl.ds(off, m_cap)] = _dist_block(q, blk, m_cap)
    gband[:, pl.ds(off, m_cap)] = blk[3, :].reshape(1, m_cap)

    @pl.when(j == 26)
    def _extract():
        vals, gids = _lex_topk(band[...], gband[...], k, n)
        vals_ref[0] = vals
        gid_ref[0] = gids


@functools.partial(jax.jit, static_argnames=("k", "gdim", "n", "interpret"))
def _grid_knn_cells_call(cand_tab, q_tab, *, k, gdim, n, interpret):
    """Run the kernel over all G cells.

    cand_tab ((G+1)*8, m_cap) f32, q_tab (G+1, m_cap, 4) f32.
    Returns (vals (G, m_cap, k) f32, gids (G, m_cap, k) int32)."""
    G = gdim ** 3
    m_cap = M_CAP
    kernel = functools.partial(
        _grid_knn_kernel, k=k, m_cap=m_cap, n=n, gdim=gdim)
    vals, gids = pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=[
            pl.BlockSpec(cand_tab.shape, lambda c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m_cap, 4), lambda c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, m_cap, k), lambda c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m_cap, k), lambda c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((G, m_cap, k), jnp.float32),
            jax.ShapeDtypeStruct((G, m_cap, k), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=int(G * m_cap * 27 * m_cap * (9 + 6 * k)),
            bytes_accessed=int(
                cand_tab.size * 4 * 2 + G * m_cap * (16 + 8 * k)),
            transcendentals=0,
        ),
        interpret=interpret,
    )(cand_tab, q_tab)
    return vals, gids


@functools.partial(jax.jit, static_argnames=("k", "gdim", "n", "interpret"))
def _grid_knn_cells_call_streamed(cand_tab3, q_tab, *, k, gdim, n, interpret):
    """Streamed-table run over grid (G, 27).

    cand_tab3 (G+1, 8, m_cap) f32 (row G = sentinel block), q_tab
    (G+1, m_cap, 4) f32. Neighbor cells are decoded ARITHMETICALLY in the
    candidate BlockSpec's index map (scalar ops trace fine there), so no
    neighbor table is needed anywhere. Returns the same (vals, gids) as the
    resident call."""
    G = gdim ** 3
    m_cap = M_CAP
    g2 = gdim * gdim

    def cand_index(c, j):
        ix = c // g2
        iy = (c // gdim) % gdim
        iz = c % gdim
        nx = ix + (j // 9 - 1)
        ny = iy + ((j // 3) % 3 - 1)
        nz = iz + (j % 3 - 1)
        inb = ((nx >= 0) & (nx < gdim) & (ny >= 0) & (ny < gdim)
               & (nz >= 0) & (nz < gdim))
        return jnp.where(inb, (nx * gdim + ny) * gdim + nz, G), 0, 0

    kernel = functools.partial(
        _grid_knn_streamed_kernel, k=k, m_cap=m_cap, n=n)
    vals, gids = pl.pallas_call(
        kernel,
        grid=(G, 27),
        in_specs=[
            pl.BlockSpec((1, 8, m_cap), cand_index,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m_cap, 4), lambda c, j: (c, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, m_cap, k), lambda c, j: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m_cap, k), lambda c, j: (c, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((G, m_cap, k), jnp.float32),
            jax.ShapeDtypeStruct((G, m_cap, k), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((m_cap, 27 * m_cap), jnp.float32),
            pltpu.VMEM((1, 27 * m_cap), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=int(G * m_cap * 27 * m_cap * (9 + 6 * k)),
            bytes_accessed=int(
                G * 27 * 8 * m_cap * 4 + G * m_cap * (16 + 8 * k)),
            transcendentals=0,
        ),
        interpret=interpret,
    )(cand_tab3, q_tab)
    return vals, gids


def _grid_knn_main(c32, valid, cid, pos, margin, ncand, sent,
                   *, k, gdim, interpret, has_mask, streamed=False):
    """Tables + kernel + finalize for one batch element (early checks
    already passed). Returns (vals (n, k) f32, idx (n, k) int32, ok,
    row_exact (n,)).

    ``sent`` (3,) f32: BOX-RELATIVE empty-slot sentinel coordinates,
    hi + 10*diag + 1 per axis. Any in-box point is then at least
    (9*diag+1)^2 squared distance from a sentinel while real in-box pairs
    are at most diag^2 apart — sentinels can NEVER outrank a real
    candidate, at any data scale, so a certified row (>= k real
    candidates in its block) provably selected only real neighbors. A
    fixed absolute sentinel would silently lose that property for data
    living near the sentinel coordinate."""
    n = c32.shape[0]
    G = gdim ** 3
    m_cap = M_CAP

    # ---- tables: one scatter into a sacrificial-row/-slot layout ----
    ok_node = valid & (pos < m_cap)
    bat_s = jnp.where(ok_node, jnp.minimum(cid, G), G + 1)
    pos_s = jnp.where(ok_node, jnp.minimum(pos, m_cap - 1), m_cap)
    xyzg = jnp.concatenate(
        [c32, jnp.arange(n, dtype=jnp.float32)[:, None]], axis=1)  # (n, 4)
    tab = jnp.concatenate([
        jnp.broadcast_to(sent, (G + 2, m_cap + 1, 3)),
        jnp.full((G + 2, m_cap + 1, 1), jnp.float32(n)),
    ], axis=-1)
    tab = tab.at[bat_s, pos_s].set(xyzg)[:G + 1, :m_cap]   # (G+1, m_cap, 4)
    q_tab = tab
    # candidate orientation: rows 8c+0..3 = x,y,z,gid
    cand_tab3 = jnp.pad(
        jnp.swapaxes(tab, 1, 2), ((0, 0), (0, 4), (0, 0)))  # (G+1, 8, m_cap)

    if _grid_resident_ok(gdim) and not streamed:
        vals_c, gid_c = _grid_knn_cells_call(
            cand_tab3.reshape((G + 1) * 8, m_cap), q_tab,
            k=k, gdim=gdim, n=n, interpret=interpret)
    else:
        vals_c, gid_c = _grid_knn_cells_call_streamed(
            cand_tab3, q_tab, k=k, gdim=gdim, n=n, interpret=interpret)

    # ---- unsort: pull each real node's row out of its (cell, slot) ----
    flat = jnp.minimum(cid, G - 1) * m_cap + jnp.minimum(pos, m_cap - 1)
    vals = vals_c.reshape(G * m_cap, k)[flat]               # (n, k)
    gid = jnp.minimum(gid_c.reshape(G * m_cap, k)[flat], n - 1)

    # shared tail: exact-tie-order re-sort + certificate + masked fill
    # (ties were resolved by gid IN selection, so no cnt component)
    return resort_and_certify(
        vals, gid, valid, margin, ncand, None, jnp.asarray(False), k,
        has_mask=has_mask)


def grid_knn_select_pallas(
    coors: jnp.ndarray,                  # (b, n, 3)
    k: int,
    mask: Optional[jnp.ndarray] = None,  # (b, n) bool
    interpret: bool = False,
    gdim: Optional[int] = None,
    streamed: bool = False,
):
    """Grid-blocked Pallas kNN selection with exactness certificate.

    Same contract as ops/spatial.grid_knn_select: returns (vals (b, n, k)
    f32, idx (b, n, k) int32, ok scalar bool, row_exact (b, n) bool); on
    ok=False callers MUST repair the ~row_exact rows (ops/neighbors.py's
    bucketed per-row repair) or fall back to the exact kernels entirely
    via lax.cond. 3-D coordinates only. ``gdim`` overrides the occupancy
    model's cell count (tests use small grids interpret-mode).

    Early exit: overflow / candidate-count failures are known from the
    cell assignment alone, so the table build and the kernel sit inside a
    scalar lax.cond — clustered data that can never certify pays only the
    O(n) assignment cost before the caller's exact fallback runs.
    """
    b, n, c = coors.shape
    assert c == 3, "grid-blocked selection is 3-D only"
    if gdim is None:
        gdim = grid_kernel_gdim(n)
    G = gdim ** 3
    c32 = coors.astype(jnp.float32)
    valid = jnp.ones((b, n), bool) if mask is None else mask

    cid, pos, counts, margin = jax.vmap(
        lambda cc, vv: cell_assignment(cc, vv, gdim))(c32, valid)
    nbr = _neighbor_cells(gdim)                             # (G, 27)
    overflow = jnp.any(counts[:, :G] > M_CAP)
    # candidate count is a per-CELL quantity: sum neighbor-cell counts at
    # cell granularity (a (G, 27) gather — hundreds of rows), then map to
    # nodes with ONE narrow gather. The old per-node (n, 27) gather cost
    # 4.4 ms at n=16384 on v5e — more than the selection kernel itself.
    ncand = jax.vmap(
        lambda cnts, ci: jnp.sum(cnts[nbr], axis=1)[jnp.minimum(ci, G - 1)]
    )(counts, cid)                                          # (b, n)

    # box-relative sentinel coordinates (see _grid_knn_main) + scale guard
    big = jnp.float32(3.4e38)
    vv3 = valid[..., None]
    lo = jnp.min(jnp.where(vv3, c32, big), axis=1)          # (b, 3)
    hi = jnp.max(jnp.where(vv3, c32, -big), axis=1)
    diag = jnp.sqrt(jnp.sum(jnp.maximum(hi - lo, 0.0) ** 2, axis=-1,
                            keepdims=True))                 # (b, 1)
    sent = hi + 10.0 * diag + 1.0                           # (b, 3)
    scale_ok = jnp.all(
        (jnp.abs(jnp.where(jnp.isfinite(hi), hi, 0.0)) < _SCALE_MAX)
        & (jnp.abs(jnp.where(jnp.isfinite(lo), lo, 0.0)) < _SCALE_MAX)
    ) & jnp.all(diag < _SCALE_MAX)

    early_ok = ((~overflow) & scale_ok
                & jnp.all((ncand >= k) | ~valid))

    main = functools.partial(
        _grid_knn_main, k=k, gdim=gdim, interpret=interpret,
        has_mask=mask is not None, streamed=streamed)

    def _run(_):
        vals, idx, ok, row_exact = jax.vmap(main)(c32, valid, cid, pos,
                                                  margin, ncand, sent)
        return vals, idx, jnp.all(ok), row_exact

    def _skip(_):
        return (
            jnp.zeros((b, n, k), jnp.float32),
            jnp.zeros((b, n, k), jnp.int32),
            jnp.asarray(False),
            jnp.zeros((b, n), bool),
        )

    vals, idx, ok, row_exact = jax.lax.cond(early_ok, _run, _skip, None)
    return vals, idx, ok, row_exact
