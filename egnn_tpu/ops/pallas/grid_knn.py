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
  op reduction (4.7x at n=16k, 19x at 65k) on both the distance fill and
  the k extraction rounds that dominate;
- exactness is certified per call exactly like the jnp grid path
  (ops/spatial.py): coverage margin + boundary-tie count (measured
  IN-kernel against the original band) + cell overflow + candidate count;
  callers lax.cond to the exact kernels on failure.

Tie order: extraction ties resolve by band position (arbitrary), then the
(n, k) results are re-sorted lexicographically by (value, global id) — the
certificate rejects boundary ties, so the selected SET is unique and the
re-sort reproduces jax.lax.top_k's global tie order exactly.

Layout notes (Mosaic constraints, see CLAUDE.md gotchas):
- candidate table: ((G+1)*8, m_cap) f32, row 8*c+cc = coordinate cc of
  cell c — dynamic sublane slices must be 8-row aligned, so each cell owns
  a full 8-row group (rows 3..7 unused). Empty slots hold SENTINEL_XYZ
  coordinates whose squared distance (~3e18) loses to every real pair but
  stays far below the eviction fill (3.4e38).
- query table: (G+1, m_cap, 4) f32 streamed one cell per program via the
  BlockSpec index map (slots on sublanes, coords on lanes — the same
  orientation trick as the quadratic kernels' (n, c) x (c, n) pair).
- neighbor cell ids: (G, 27) int32 in SMEM, one row per program.

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
from .knn import _extract_topk

_LANE = 128
M_CAP = 128          # slots per cell == one lane tile (alignment-free)
SENTINEL_XYZ = 1e9   # empty-slot coordinate: d^2 ~ 3e18 << eviction fill

# Mean-occupancy target: high enough that slot padding stays ~2x (the band
# is 27*M_CAP wide regardless), low enough that the Poisson tail never
# overflows M_CAP=128 slots: P(X > 128 | 64) ~ 5e-12 per cell. gdim
# rounding drifts actual occupancy to ~64-96; the overflow certificate
# catches the (rare) pileups regardless.
_OCC_TARGET = 64.0
# Reject shapes whose rounded grid drifts the mean occupancy above this:
# P(X > 128 | 96) ~ 8e-4 per cell makes whole-call fallback likely.
_OCC_MAX = 96.0


def grid_kernel_gdim(n: int) -> int:
    """Static cells-per-axis for the kernel's occupancy model."""
    return max(4, int(round((n / _OCC_TARGET) ** (1.0 / 3.0))))


def supports_grid_knn(n: int, k: int, backend: Optional[str] = None) -> bool:
    """Kernel applicability: TPU, band-width win, occupancy in the safe
    window, and the candidate table resident in VMEM (~6 MB budget)."""
    if backend is None:
        backend = jax.default_backend()
    gdim = grid_kernel_gdim(n)
    G = gdim ** 3
    table_bytes = (G + 1) * 8 * M_CAP * 4
    return (
        backend == "tpu"
        and 1 <= k <= M_CAP
        and n >= 8192                      # below: exact kernels already win
        and n / G <= _OCC_MAX
        and table_bytes <= 6 * 1024 * 1024
    )


def _grid_knn_kernel(nbr_ref, cand_ref, q_ref, vals_ref, posc_ref,
                     *, k: int, m_cap: int):
    """One spatial cell per program: rank the 27-block candidate band for
    the cell's m_cap query slots and emit top-k (vals, band positions) plus
    the boundary-tie count."""
    q = q_ref[0]                                    # (m_cap, 4)
    blocks = []
    for j in range(27):
        cell = nbr_ref[0, j]
        r0 = pl.multiple_of(cell * 8, 8)
        blk = cand_ref[pl.ds(r0, 8), :]             # (8, m_cap): x,y,z rows
        d = jnp.zeros((m_cap, m_cap), jnp.float32)
        for cc in range(3):
            qi = q[:, cc].reshape(m_cap, 1)
            xj = blk[cc, :].reshape(1, m_cap)
            dd = qi - xj
            d = d + dd * dd
        blocks.append(d)
    band = jnp.concatenate(blocks, axis=1)          # (m_cap, 27*m_cap)
    width = 27 * m_cap
    col = jax.lax.broadcasted_iota(jnp.int32, (m_cap, width), 1)

    vals, poss = _extract_topk(band, col, k, width)
    # boundary-tie count against the ORIGINAL band: cnt == k iff no tie
    # group straddles the k-boundary (certificate component)
    vkth = vals[:, k - 1].reshape(m_cap, 1)
    cnt = jnp.sum((band <= vkth).astype(jnp.int32), axis=1, keepdims=True)

    vals_ref[0] = vals
    posc_ref[0] = jnp.concatenate([poss, cnt], axis=1)


@functools.partial(jax.jit, static_argnames=("k", "gdim", "interpret"))
def _grid_knn_cells_call(cand_tab, q_tab, nbr, *, k, gdim, interpret):
    """Run the kernel over all G cells.

    cand_tab ((G+1)*8, m_cap) f32, q_tab (G+1, m_cap, 4) f32,
    nbr (G, 27) int32. Returns (vals (G, m_cap, k) f32,
    posc (G, m_cap, k+1) int32 — band positions + tie count)."""
    G = gdim ** 3
    m_cap = M_CAP
    kernel = functools.partial(_grid_knn_kernel, k=k, m_cap=m_cap)
    vals, posc = pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((1, 27), lambda c: (c, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(cand_tab.shape, lambda c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m_cap, 4), lambda c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, m_cap, k), lambda c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m_cap, k + 1), lambda c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((G, m_cap, k), jnp.float32),
            jax.ShapeDtypeStruct((G, m_cap, k + 1), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=int(G * m_cap * 27 * m_cap * (9 + 4 * k + 1)),
            bytes_accessed=int(
                cand_tab.size * 4 * 2 + G * m_cap * (16 + 8 * k + 4)),
            transcendentals=0,
        ),
        interpret=interpret,
    )(nbr, cand_tab, q_tab)
    return vals, posc


def _grid_knn_pallas_single(c32, valid, *, k, gdim, interpret, has_mask):
    """One batch element. c32 (n, 3) f32, valid (n,) bool.
    Returns (vals (n, k) f32, idx (n, k) int32, ok bool)."""
    n = c32.shape[0]
    G = gdim ** 3
    m_cap = M_CAP

    cid, pos, counts, margin = cell_assignment(c32, valid, gdim)
    overflow = jnp.any(counts[:G] > m_cap)

    # ---- tables: one scatter into a sacrificial-row/-slot layout ----
    ok_node = valid & (pos < m_cap)
    bat_s = jnp.where(ok_node, jnp.minimum(cid, G), G + 1)
    pos_s = jnp.where(ok_node, jnp.minimum(pos, m_cap - 1), m_cap)
    xyzg = jnp.concatenate(
        [c32, jnp.arange(n, dtype=jnp.float32)[:, None]], axis=1)  # (n, 4)
    tab = jnp.full((G + 2, m_cap + 1, 4), jnp.float32(SENTINEL_XYZ))
    tab = tab.at[:, :, 3].set(jnp.float32(n))
    tab = tab.at[bat_s, pos_s].set(xyzg)[:G + 1, :m_cap]   # (G+1, m_cap, 4)
    gid_tab = tab[:, :, 3].astype(jnp.int32)                # (G+1, m_cap)
    q_tab = tab
    # candidate orientation: ((G+1)*8, m_cap), rows 8c+0..2 = x,y,z
    cand_tab = jnp.pad(
        jnp.swapaxes(tab[:, :, :3], 1, 2), ((0, 0), (0, 5), (0, 0))
    ).reshape((G + 1) * 8, m_cap)

    nbr = _neighbor_cells(gdim)                             # (G, 27)

    vals_c, posc = _grid_knn_cells_call(
        cand_tab, q_tab, nbr, k=k, gdim=gdim, interpret=interpret)

    # ---- unsort: pull each real node's row out of its (cell, slot) ----
    flat = jnp.minimum(cid, G - 1) * m_cap + jnp.minimum(pos, m_cap - 1)
    vals = vals_c.reshape(G * m_cap, k)[flat]               # (n, k)
    pc = posc.reshape(G * m_cap, k + 1)[flat]
    bandpos = pc[:, :k]
    cnt = pc[:, k]

    # ---- band position -> global id (tiny (n, k) gathers) ----
    jcell = bandpos // m_cap
    slot = bandpos % m_cap
    cell_sel = jnp.take_along_axis(
        nbr[jnp.minimum(cid, G - 1)], jcell, axis=1)        # (n, k)
    gid = gid_tab[cell_sel, slot]                           # (n, k); n=empty
    gid = jnp.minimum(gid, n - 1)

    # shared tail: exact-tie-order re-sort + certificate + masked fill
    n_valid_cand = jnp.sum(
        counts[nbr[jnp.minimum(cid, G - 1)]], axis=1)       # (n,)
    return resort_and_certify(
        vals, gid, valid, margin, n_valid_cand, cnt, overflow, k,
        has_mask=has_mask)


def grid_knn_select_pallas(
    coors: jnp.ndarray,                  # (b, n, 3)
    k: int,
    mask: Optional[jnp.ndarray] = None,  # (b, n) bool
    interpret: bool = False,
    gdim: Optional[int] = None,
):
    """Grid-blocked Pallas kNN selection with exactness certificate.

    Same contract as ops/spatial.grid_knn_select: returns (vals (b, n, k)
    f32, idx (b, n, k) int32, ok scalar bool); on ok=False callers MUST
    fall back to the exact kernels (ops/neighbors.py does this via
    lax.cond). 3-D coordinates only. ``gdim`` overrides the occupancy
    model's cell count (tests use small grids interpret-mode)."""
    b, n, c = coors.shape
    assert c == 3, "grid-blocked selection is 3-D only"
    if gdim is None:
        gdim = grid_kernel_gdim(n)
    fn = functools.partial(
        _grid_knn_pallas_single, k=k, gdim=gdim, interpret=interpret,
        has_mask=mask is not None)
    c32 = coors.astype(jnp.float32)
    if mask is None:
        valid = jnp.ones((b, n), bool)
    else:
        valid = mask
    vals, idx, ok = jax.vmap(fn)(c32, valid)
    return vals, idx, jnp.all(ok)
