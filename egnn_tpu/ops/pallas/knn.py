"""Fused masked-kNN selection as a Pallas TPU kernel.

Replaces the reference's hottest O(n^2) section (egnn_pytorch.py:232-268):
materialize all-pairs squared distances, apply the masked-ranking fill rules
(mask -> 1e5, self -> -1, adjacent -> 0), then ``topk(largest=False)``.

TPU-native design: the (b, n, n) ranking matrix never exists in HBM. The grid
is (batch, i-tiles); each program builds one (TI, n) ranking row-band in
registers/VMEM (distances on the VPU, fill rules fused in), then extracts the
k smallest per row with k lane-aligned min/first-argmin/evict rounds. The
winning lane position IS the global neighbor index, so there is no index
bookkeeping or unaligned concatenation. HBM traffic is O(n·(c + k)) per row
instead of O(n^2) for the XLA path (distance matrix + top_k sort).

Tie-breaking parity: first-occurrence argmin resolves equal rankings to the
lowest j — the same order ``jax.lax.top_k`` produces. The fill values (-1
self, 0 adjacent, 1e5 masked) create massive tie groups, so this is
load-bearing for parity with the jnp path (see tests/test_pallas_knn.py).

Selection is not differentiated: indices are integers and the ranking values
only feed a <=-radius comparison, so callers pass ``stop_gradient`` inputs
(see ops/neighbors.py:knn_select).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MASKED_RANK_FILL = 1e5   # egnn_pytorch.py:242
_PAD_FILL = 3.0e37       # padded-j columns: must lose to every real ranking
_EVICT_FILL = 3.4e38     # evicted slots between extraction rounds

_LANE = 128
# adjacency band dtype (i8 = 4x less HBM than i32; see _prep_knn_inputs)
_ADJ_DTYPE = jnp.int8


# Supported tiling knob (VERDICT r4 item 8): harnesses (bench.py, ab_ti.py)
# used to monkey-patch _pick_ti; this is the public equivalent. Selection
# results are bit-identical across band heights — performance only.
_BAND_HEIGHT_OVERRIDE: Optional[int] = None


def set_band_height(ti: Optional[int]) -> None:
    """Override the full-band kernel's row-band height for subsequent calls
    (None restores the measured default, see _pick_ti). Heights that don't
    divide the padded n fall back to the default for that call. Clears the
    kernel's jit cache so traces already cached at another height re-trace.
    """
    global _BAND_HEIGHT_OVERRIDE
    _BAND_HEIGHT_OVERRIDE = ti
    _knn_call.clear_cache()
    _knn_gather_call.clear_cache()


def _effective_ti(n: int, band_height: Optional[int]) -> int:
    ti = band_height if band_height is not None else _BAND_HEIGHT_OVERRIDE
    if ti is not None and n % ti == 0:
        return ti
    return _pick_ti(n)


def _pick_ti(n: int) -> int:
    """Row-band height. Short bands WIN on-chip: at n=1024/k=8 (v5e,
    benchmarks/ab_ti.py, round 4) ti=128 measures 24.0 us bare / 24.4 us
    under the flagship's mask+adjacency bands vs 40.6/53.1 us for the old
    512-row default and 47/53 us for a single 1024-row program — taller
    bands were never faster at any measured n (n>=4096 already used 128
    via the VMEM budget). Selection results are bit-identical across ti
    (pinned by tests and the ab_ti index gate); VMEM trivially fits
    ((128, n) f32 band + iota + adj band = 1.5 kB * n <= 12 MB bound that
    supports_pallas_knn_shapes already enforces at n <= 16384)."""
    del n  # padded to a _LANE multiple by every caller
    return _LANE


def supports_pallas_knn_shapes(n: int) -> bool:
    """Whether the full-band kernel fits scoped VMEM at the smallest tile
    height: the two live (TI, n) f32/i32 buffers (ranking band + column
    iota) against the 16 MB limit. Measured on v5e: compiles and runs at
    n=16384 (2x8 MB, 3.3 ms at k=8), compile-fails at 32768 — beyond this
    the j-tiled variant (knn_select_pallas_tiled) takes over."""
    n_pad = -(-n // _LANE) * _LANE
    return _LANE * n_pad * 4 * 2 <= 16 * 1024 * 1024


def supports_pallas_knn(n: int, k: int, backend: Optional[str] = None) -> bool:
    """Whether the Pallas path applies: TPU backend (Mosaic kernels are
    TPU-only) and a problem that fits the kernel's VMEM model."""
    if backend is None:
        backend = jax.default_backend()
    return (
        backend == "tpu"
        and n >= _LANE
        and 1 <= k <= _LANE
        and supports_pallas_knn_shapes(n)
    )


def _prep_knn_inputs(coors, mask, adj_mat, has_mask, has_adj):
    """Shared host-side prep for both selection kernels: f32 cast, lane
    padding, (b, c, n) transpose for lane-contiguous j reads, and dummy
    mask/adj arrays (never read when the corresponding flag is off)."""
    b, n_real, c = coors.shape
    n = -(-n_real // _LANE) * _LANE
    pad = n - n_real
    coors32 = coors.astype(jnp.float32)
    if pad:
        coors32 = jnp.pad(coors32, ((0, 0), (0, pad), (0, 0)))
    coors_t = jnp.swapaxes(coors32, 1, 2)
    if has_mask:
        mask_i32 = jnp.pad(mask.astype(jnp.int32), ((0, 0), (0, pad)))[:, None, :]
    else:
        mask_i32 = jnp.zeros((b, 1, n), jnp.int32)  # dummy, never read
    if has_adj:
        # int8, not int32: the adjacency band is the kernels' largest input
        # ((b, n, n) — 4x less HBM traffic and footprint as i8; at n=16384
        # the i32 band alone would be 1 GB). Mosaic on this toolchain loads
        # i8 vectors fine as long as the COMPARE happens after an in-kernel
        # i32 convert (vector compares on i8 are unsupported — CLAUDE.md
        # gotcha), which the kernels do. Throughput-NEUTRAL at n=1024 and
        # n=4096 (24.3 vs 24.8 / 490.6 vs 491.5 us — the band kernels are
        # VPU-compute-bound, benchmarks/ab_adj_dtype.py); kept for the 4x
        # smaller HBM footprint (the i32 band is 1 GB at n=16384).
        # (adj != 0), not a plain astype: an integer adjacency whose nonzero
        # entries are multiples of 256 would wrap to 0 under a bare i8 cast
        # and silently drop those edges.
        adj_band = jnp.pad((adj_mat != 0).astype(_ADJ_DTYPE),
                           ((0, 0), (0, pad), (0, pad)))
    else:
        adj_band = jnp.zeros((b, 8, _LANE), _ADJ_DTYPE)  # dummy, never read
    return coors32, coors_t, mask_i32, adj_band, b, n_real, n, c


def _knn_kernel(coors_ref, coors_t_ref, mask_ref, adj_ref,
                out_vals_ref, out_idx_ref,
                *, n: int, n_real: int, k: int, c: int, ti: int,
                has_mask: bool, has_adj: bool):
    i0 = pl.program_id(1) * ti

    col = jax.lax.broadcasted_iota(jnp.int32, (ti, n), 1)

    # ---- (TI, n) ranking band: squared distances + fill rules ----
    ranking = jnp.zeros((ti, n), jnp.float32)
    for cc in range(c):
        xi_c = coors_ref[0, pl.ds(i0, ti), cc].reshape(ti, 1)
        xj_c = coors_t_ref[0, cc, :].reshape(1, n)
        d = xi_c - xj_c
        ranking = ranking + d * d
    if has_mask:
        mi = mask_ref[0, 0, pl.ds(i0, ti)].reshape(ti, 1)
        mj = mask_ref[0, 0, :].reshape(1, n)
        ranking = jnp.where((mi * mj) > 0, ranking, MASKED_RANK_FILL)
    if has_adj:
        # Fill order matches ops/neighbors.py:knn_ranking: self -> -1 first,
        # then adjacent-and-not-self -> 0.
        row_g = jax.lax.broadcasted_iota(jnp.int32, (ti, n), 0) + i0
        eye = row_g == col
        at = adj_ref[0, :, :].astype(jnp.int32) > 0
        ranking = jnp.where(eye, -1.0, ranking)
        ranking = jnp.where(at & ~eye, 0.0, ranking)
    if n != n_real:
        ranking = jnp.where(col >= n_real, _PAD_FILL, ranking)

    # ---- k extraction rounds: min / first-argmin / evict ----
    # (measured alternatives that LOST on v5e: a read-only band with
    # lexicographic (value, col) thresholds instead of eviction — more
    # elementwise ops per round, 51 vs 40 us at k=8; jax.lax.approx_min_k
    # with recall 1.0 over an XLA-fused band — 140 us. The kernel is purely
    # VPU-op-bound; per-round cost is the two reductions + ~4 elementwise.)
    vals, idxs = [], []
    for _ in range(k):
        m = jnp.min(ranking, axis=1, keepdims=True)
        pos = jnp.min(jnp.where(ranking == m, col, n), axis=1, keepdims=True)
        vals.append(m)
        idxs.append(pos)
        ranking = jnp.where(col == pos, _EVICT_FILL, ranking)

    out_vals_ref[0, :, :] = jnp.concatenate(vals, axis=1)
    out_idx_ref[0, :, :] = jnp.concatenate(idxs, axis=1)


@functools.partial(
    jax.jit,
    static_argnames=("k", "interpret", "has_mask", "has_adj", "band_height"),
)
def _knn_call(coors, mask, adj_mat, *, k, interpret, has_mask, has_adj,
              band_height=None):
    coors32, coors_t, mask_i32, adj_band, b, n_real, n, c = _prep_knn_inputs(
        coors, mask, adj_mat, has_mask, has_adj)
    ti = _effective_ti(n, band_height)

    grid = (b, n // ti)
    kernel = functools.partial(
        _knn_kernel, n=n, n_real=n_real, k=k, c=c, ti=ti,
        has_mask=has_mask, has_adj=has_adj,
    )
    vals, idx = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, n, c), lambda ib, ii: (ib, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, n), lambda ib, ii: (ib, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, 1, mask_i32.shape[2]),
                lambda ib, ii: (ib, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, ti, adj_band.shape[2]) if has_adj else (1, 8, _LANE),
                (lambda ib, ii: (ib, ii, 0)) if has_adj else (lambda ib, ii: (ib, 0, 0)),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec((1, ti, k), lambda ib, ii: (ib, ii, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ti, k), lambda ib, ii: (ib, ii, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n, k), jnp.float32),
            jax.ShapeDtypeStruct((b, n, k), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=int(3 * b * n * n * c + 4 * b * n * n * k),
            bytes_accessed=int(b * n * (4 * c + 8 * k) + (b * n * n * 4 if has_adj else 0)),
            transcendentals=0,
        ),
        interpret=interpret,
    )(coors32, coors_t, mask_i32, adj_band)

    return vals[:, :n_real], idx[:, :n_real]


def knn_select_pallas(
    coors: jnp.ndarray,
    k: int,
    mask: Optional[jnp.ndarray] = None,
    adj_mat: Optional[jnp.ndarray] = None,
    interpret: bool = False,
    band_height: Optional[int] = None,
):
    """Top-k neighbor selection under the reference's ranking rules.

    Args:
      coors: (b, n, c) coordinates (any float dtype; ranking runs in f32).
      k: static neighbor count (``num_nearest_neighbors``).
      mask: optional (b, n) bool node mask.
      adj_mat: optional (b, n, n) bool adjacency (self/adjacent overrides).
      interpret: run in the Pallas interpreter (CPU testing).
      band_height: optional row-band height (tiling knob; results are
        bit-identical across heights — see set_band_height for the
        process-wide override). Must divide the lane-padded n, else the
        measured default applies.

    Returns:
      (vals, idx): (b, n, k) f32 winning ranking values (ascending) and
      (b, n, k) int32 neighbor indices.
    """
    return _knn_call(
        coors, mask, adj_mat, k=k, interpret=interpret,
        has_mask=mask is not None, has_adj=adj_mat is not None,
        band_height=band_height,
    )


# ---------------------------------------------------------------------------
# selection FUSED with the payload gather (full-band + in-kernel MXU extract)
# ---------------------------------------------------------------------------
#
# The full-band kernel streams every node's coordinates through VMEM and
# throws them away; the layer then re-fetches the winners' [coors|mask|feats]
# rows with an XLA gather (~25 us/layer fwd+bwd at the flagship, the
# second-largest per-layer cost after the XLA pair pipeline — BASELINE.md).
# This variant keeps the (n, tw) payload table resident in VMEM and extracts
# each extraction round's winner row with a one-hot MXU matmul: the winner
# one-hot (col == pos) is already computed for the eviction, and
# onehot @ table under Precision.HIGHEST is BIT-exact row extraction (one
# 1.0*v product, n-1 exact 0.0 products — the same guarantee
# ops/core.py:gather_rows_blocked pins on-chip). k rounds deposit a
# (ti, k*tw) block, one aligned store.
#
# MEASURED (v5e, round 5, benchmarks/ab_fused_gather.py, flagship n=1024
# k=8 dim=32 under mask+adjacency): forward alone LOSES (85.8 us vs 44.1 us
# select+XLA-gather — the HIGHEST one-hot matmuls cost ~62 us), but the
# LAYER fwd+bwd wins 150.2 vs 174.0 us and the depth-3 network 453.7 vs
# 526.3 us (-14%): the backward collapses to one segment-sum scatter on the
# saved indices and the (b,n,k,tw) gather intermediate disappears from the
# autodiff graph. Bitwise identical to select+gather (on-chip gate).
# Default via FUSED_GATHER_AUTO in ops/neighbors.py (layer-level discipline:
# op-level timings were anti-predictive here — re-measure at the layer).
#
# EXTRACTION PRECISION (extract="split3"): Precision.HIGHEST on f32 MXU
# inputs runs SIX bf16 passes (each operand split into 3 bf16 chunks, the
# 6 significant cross terms accumulated) — and the measured 62 us one-hot
# cost sits exactly at that 6-pass MXU roofline. But with a ONE-HOT left
# operand only the 3 right-side chunks matter: 1.0 and 0.0 are exact in
# bf16, so onehot@t_hi + onehot@t_mid + onehot@t_lo at DEFAULT precision
# reproduces the f32 row BITWISE (v = hi+mid+lo is the exact 3-way bf16
# decomposition of an f32 — 8+8+8 mantissa bits; each product 1.0*chunk
# is exact in the f32 accumulator; (hi+mid) zeroes v's low bits so the
# f32 adds are exact) at HALF the MXU passes. Caveat: chunks below the
# bf16 subnormal threshold flush, so bitwise equality needs |v| >~ 1e-30
# (payloads are coords/feats, O(1)). Parity: tests/test_pallas_knn.py
# pins split3 == highest == plain gather bitwise (interpret + CPU), the
# ab_fused_gather on-chip gate pins it on hardware.


# Extraction method used when knn_select_gather_pallas gets extract=None.
# "split3" measured on-chip (v5e, round 5, benchmarks/ab_split3.py,
# flagship n=1024 k=8 dim=32 mask+adjacency, bitwise-gated): kernel fwd
# 84.6 -> 48.1 us, layer fwd+bwd 146.1 -> 111.8, depth-3 network fwd+bwd
# 456.2 -> 347.1 us (-24%) — the 3-vs-6-pass model held at every level.
FUSED_EXTRACT = "split3"


def supports_pallas_knn_gather(n: int, tw: int, k: int) -> bool:
    """VMEM model: the two (TI, n) f32 band buffers (ranking + col iota)
    plus the lane-padded payload table (6 B/elem — the split3 extraction's
    three bf16 planes; the f32 single-table variant uses less), coordinate
    planes, and the (TI, k*tw) output block, against a 14 MB bound (2 MB
    headroom for Mosaic temporaries and lax.cond output placement —
    CLAUDE.md gotcha)."""
    n_pad = -(-n // _LANE) * _LANE
    tw_pad = -(-tw // _LANE) * _LANE
    ktw_pad = -(-(k * tw) // _LANE) * _LANE
    used = (
        2 * _LANE * n_pad * 4      # ranking band + col iota
        + n_pad * tw_pad * 6       # payload table (3 bf16 planes)
        + 2 * n_pad * _LANE * 4    # coors + coors_t lane-padded planes
        + _LANE * ktw_pad * 4      # payload output block
    )
    return used <= 14 * 1024 * 1024


def _knn_gather_kernel(coors_ref, coors_t_ref, mask_ref, adj_ref, *refs,
                       n: int, n_real: int, k: int, c: int, ti: int,
                       tw: int, has_mask: bool, has_adj: bool,
                       extract: str):
    del tw
    if extract == "split3":
        (t_hi_ref, t_mid_ref, t_lo_ref,
         out_vals_ref, out_idx_ref, out_pay_ref) = refs
    else:
        table_ref, out_vals_ref, out_idx_ref, out_pay_ref = refs
    i0 = pl.program_id(1) * ti
    col = jax.lax.broadcasted_iota(jnp.int32, (ti, n), 1)

    # ---- (TI, n) ranking band: identical to _knn_kernel ----
    ranking = jnp.zeros((ti, n), jnp.float32)
    for cc in range(c):
        xi_c = coors_ref[0, pl.ds(i0, ti), cc].reshape(ti, 1)
        xj_c = coors_t_ref[0, cc, :].reshape(1, n)
        d = xi_c - xj_c
        ranking = ranking + d * d
    if has_mask:
        mi = mask_ref[0, 0, pl.ds(i0, ti)].reshape(ti, 1)
        mj = mask_ref[0, 0, :].reshape(1, n)
        ranking = jnp.where((mi * mj) > 0, ranking, MASKED_RANK_FILL)
    if has_adj:
        row_g = jax.lax.broadcasted_iota(jnp.int32, (ti, n), 0) + i0
        eye = row_g == col
        at = adj_ref[0, :, :].astype(jnp.int32) > 0
        ranking = jnp.where(eye, -1.0, ranking)
        ranking = jnp.where(at & ~eye, 0.0, ranking)
    if n != n_real:
        ranking = jnp.where(col >= n_real, _PAD_FILL, ranking)

    dims = (((1,), (0,)), ((), ()))
    if extract == "split3":
        planes = (t_hi_ref[0, :, :], t_mid_ref[0, :, :], t_lo_ref[0, :, :])
    else:
        table = table_ref[0, :, :]
    vals, idxs, pays = [], [], []
    for _ in range(k):
        m = jnp.min(ranking, axis=1, keepdims=True)
        pos = jnp.min(jnp.where(ranking == m, col, n), axis=1, keepdims=True)
        if extract == "split3":
            # 3 DEFAULT bf16 passes == the HIGHEST 6-pass result bitwise
            # for a one-hot left operand (see module note above).
            onehot = (col == pos).astype(jnp.bfloat16)
            hi, mid, lo = (
                jax.lax.dot_general(
                    onehot, p, dims,
                    precision=jax.lax.Precision.DEFAULT,
                    preferred_element_type=jnp.float32,
                )
                for p in planes
            )
            pay = (hi + mid) + lo
        else:
            onehot = (col == pos).astype(jnp.float32)
            pay = jax.lax.dot_general(
                onehot, table, dims,
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )
        vals.append(m)
        idxs.append(pos)
        pays.append(pay)
        ranking = jnp.where(col == pos, _EVICT_FILL, ranking)

    out_vals_ref[0, :, :] = jnp.concatenate(vals, axis=1)
    out_idx_ref[0, :, :] = jnp.concatenate(idxs, axis=1)
    out_pay_ref[0, :, :] = jnp.concatenate(pays, axis=1)


@functools.partial(
    jax.jit,
    static_argnames=("k", "interpret", "has_mask", "has_adj", "band_height",
                     "extract"),
)
def _knn_gather_call(coors, mask, adj_mat, table, *, k, interpret, has_mask,
                     has_adj, band_height=None, extract="highest"):
    coors32, coors_t, mask_i32, adj_band, b, n_real, n, c = _prep_knn_inputs(
        coors, mask, adj_mat, has_mask, has_adj)
    tw = table.shape[-1]
    table32 = table.astype(jnp.float32)
    if n != n_real:
        table32 = jnp.pad(table32, ((0, 0), (0, n - n_real), (0, 0)))
    ti = _effective_ti(n, band_height)

    if extract == "split3":
        # Exact 3-way bf16 decomposition (t_hi + t_mid + t_lo == table32
        # bitwise, all values): the kernel's one-hot extraction then needs
        # 3 DEFAULT passes, not HIGHEST's 6. The split is BIT-LEVEL
        # (truncation, not round-to-nearest): the axon terminal forces
        # --xla_allow_excess_precision=true, under which XLA elides
        # f32->bf16->f32 convert chains — the arithmetic split
        # (t - bf16(t).f32()) then folds its residual to ZERO and the lo
        # plane vanishes (measured on-chip: 2^-16-level payload error,
        # round-5 smoke). Mask-truncation has no convert chain to elide:
        # hi = top 16 bits of the f32 (definitionally a bf16), each
        # residual a clean suffix (<= 16 / <= 8 significant bits), so the
        # subtracts and the final bf16 cast are all exact.
        def _trunc_split(t):
            u = jax.lax.bitcast_convert_type(t, jnp.uint32)
            hi_f = jax.lax.bitcast_convert_type(
                u & jnp.uint32(0xFFFF0000), jnp.float32)
            hi_b = jax.lax.bitcast_convert_type(
                (u >> 16).astype(jnp.uint16), jnp.bfloat16)
            return hi_f, hi_b

        hi_f, t_hi = _trunc_split(table32)
        r1 = table32 - hi_f
        mid_f, t_mid = _trunc_split(r1)
        t_lo = (r1 - mid_f).astype(jnp.bfloat16)
        table_inputs = [t_hi, t_mid, t_lo]
    else:
        table_inputs = [table32]
    table_specs = [
        pl.BlockSpec((1, n, tw), lambda ib, ii: (ib, 0, 0),
                     memory_space=pltpu.VMEM)
        for _ in table_inputs
    ]

    grid = (b, n // ti)
    kernel = functools.partial(
        _knn_gather_kernel, n=n, n_real=n_real, k=k, c=c, ti=ti, tw=tw,
        has_mask=has_mask, has_adj=has_adj, extract=extract,
    )
    vals, idx, pay = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, n, c), lambda ib, ii: (ib, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, n), lambda ib, ii: (ib, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, 1, mask_i32.shape[2]),
                lambda ib, ii: (ib, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, ti, adj_band.shape[2]) if has_adj else (1, 8, _LANE),
                (lambda ib, ii: (ib, ii, 0)) if has_adj else (lambda ib, ii: (ib, 0, 0)),
                memory_space=pltpu.VMEM,
            ),
            *table_specs,
        ],
        out_specs=[
            pl.BlockSpec((1, ti, k), lambda ib, ii: (ib, ii, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ti, k), lambda ib, ii: (ib, ii, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ti, k * tw), lambda ib, ii: (ib, ii, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n, k), jnp.float32),
            jax.ShapeDtypeStruct((b, n, k), jnp.int32),
            jax.ShapeDtypeStruct((b, n, k * tw), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=int(3 * b * n * n * c + 4 * b * n * n * k
                      + 2 * b * n * n * k * tw),
            bytes_accessed=int(b * n * (4 * c + 8 * k + 4 * tw * (1 + k))
                               + (b * n * n if has_adj else 0)),
            transcendentals=0,
        ),
        interpret=interpret,
    )(coors32, coors_t, mask_i32, adj_band, *table_inputs)

    return (
        vals[:, :n_real],
        idx[:, :n_real],
        pay[:, :n_real].reshape(b, n_real, k, tw),
    )


def knn_select_gather_pallas(
    coors: jnp.ndarray,
    k: int,
    table: jnp.ndarray,                    # (b, n, tw) payload rows
    mask: Optional[jnp.ndarray] = None,
    adj_mat: Optional[jnp.ndarray] = None,
    interpret: bool = False,
    band_height: Optional[int] = None,
    extract: Optional[str] = None,         # None -> FUSED_EXTRACT
):
    """Selection + payload gather in ONE kernel pass (forward only — the
    caller owns differentiation; ops/neighbors.py wraps this in a custom
    VJP whose backward is the same segment-sum scatter gather_nodes uses).

    Returns ``(vals, idx, gathered)`` where gathered is (b, n, k, tw) — the
    table rows at the winning indices, bit-exact with
    ``gather_nodes(table, idx)`` (one-hot extraction: "highest" = one
    HIGHEST dot, "split3" = three DEFAULT bf16-plane dots; identical
    results, see the module note)."""
    if extract is None:
        extract = FUSED_EXTRACT
    return _knn_gather_call(
        coors, mask, adj_mat, table, k=k, interpret=interpret,
        has_mask=mask is not None, has_adj=adj_mat is not None,
        band_height=band_height, extract=extract,
    )


# ---------------------------------------------------------------------------
# asymmetric query-vs-points variant: exact selection for a ROW SUBSET
# ---------------------------------------------------------------------------


def _pick_ti_queries(n_pad: int) -> int:
    """Query-band height: the kernel runs inside a lax.cond branch (the
    grid path's per-row repair), where XLA stacks the branch OUTPUTS on
    top of the kernel's scoped VMEM (CLAUDE.md gotcha) — so cap the two
    (ti, n) planes at ~9 MB instead of the full 16."""
    ti = _LANE
    while ti > 8 and 2 * ti * n_pad * 4 > 9 * 1024 * 1024:
        ti //= 2
    return ti


def supports_pallas_knn_queries(n: int) -> bool:
    n_pad = -(-n // _LANE) * _LANE
    return 2 * 8 * n_pad * 4 <= 9 * 1024 * 1024


def _knn_query_kernel(q_ref, qm_ref, coors_t_ref, mask_ref,
                      out_vals_ref, out_idx_ref,
                      *, n: int, n_real: int, k: int, c: int, ti: int,
                      has_mask: bool):
    i0 = pl.program_id(1) * ti
    col = jax.lax.broadcasted_iota(jnp.int32, (ti, n), 1)
    ranking = jnp.zeros((ti, n), jnp.float32)
    for cc in range(c):
        xi_c = q_ref[0, pl.ds(i0, ti), cc].reshape(ti, 1)
        xj_c = coors_t_ref[0, cc, :].reshape(1, n)
        d = xi_c - xj_c
        ranking = ranking + d * d
    if has_mask:
        mi = qm_ref[0, 0, pl.ds(i0, ti)].reshape(ti, 1)
        mj = mask_ref[0, 0, :].reshape(1, n)
        ranking = jnp.where((mi * mj) > 0, ranking, MASKED_RANK_FILL)
    if n != n_real:
        ranking = jnp.where(col >= n_real, _PAD_FILL, ranking)
    vals, idxs = [], []
    for _ in range(k):
        m = jnp.min(ranking, axis=1, keepdims=True)
        pos = jnp.min(jnp.where(ranking == m, col, n), axis=1, keepdims=True)
        vals.append(m)
        idxs.append(pos)
        ranking = jnp.where(col == pos, _EVICT_FILL, ranking)
    out_vals_ref[0, :, :] = jnp.concatenate(vals, axis=1)
    out_idx_ref[0, :, :] = jnp.concatenate(idxs, axis=1)


@functools.partial(jax.jit, static_argnames=("k", "interpret", "has_mask"))
def _knn_query_call(queries, q_mask, points, p_mask, *, k, interpret,
                    has_mask):
    b, r_real, c = queries.shape
    n_real = points.shape[1]
    n = -(-n_real // _LANE) * _LANE
    ti = _pick_ti_queries(n)
    r = -(-r_real // ti) * ti
    q32 = queries.astype(jnp.float32)
    if r != r_real:
        q32 = jnp.pad(q32, ((0, 0), (0, r - r_real), (0, 0)))
    pts = points.astype(jnp.float32)
    if n != n_real:
        pts = jnp.pad(pts, ((0, 0), (0, n - n_real), (0, 0)))
    coors_t = jnp.swapaxes(pts, 1, 2)
    if has_mask:
        qm = jnp.pad(q_mask.astype(jnp.int32),
                     ((0, 0), (0, r - r_real)))[:, None, :]
        pm = jnp.pad(p_mask.astype(jnp.int32),
                     ((0, 0), (0, n - n_real)))[:, None, :]
    else:
        qm = jnp.zeros((b, 1, r), jnp.int32)
        pm = jnp.zeros((b, 1, n), jnp.int32)
    grid = (b, r // ti)
    kernel = functools.partial(
        _knn_query_kernel, n=n, n_real=n_real, k=k, c=c, ti=ti,
        has_mask=has_mask)
    vals, idx = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, r, c), lambda ib, ii: (ib, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, r), lambda ib, ii: (ib, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, n), lambda ib, ii: (ib, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n), lambda ib, ii: (ib, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, ti, k), lambda ib, ii: (ib, ii, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ti, k), lambda ib, ii: (ib, ii, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, r, k), jnp.float32),
            jax.ShapeDtypeStruct((b, r, k), jnp.int32),
        ],
        interpret=interpret,
    )(q32, qm, coors_t, pm)
    return vals[:, :r_real], idx[:, :r_real]


# ---------------------------------------------------------------------------
# WINDOWED query variant: exact selection of query rows against an x-sorted
# point window (the grid path's tier-0 repair engine, round 5)
# ---------------------------------------------------------------------------
#
# The full-scan repair re-ranks each failing row against ALL n points —
# O(R*n) — although a failing row's true neighbors live within a bounded
# margin of its own position (VERDICT r4 item 2). With points SORTED BY
# x-COORDINATE, a contiguous window of W sorted rows centered on the query's
# x-rank covers every true neighbor whose distance is below the window's
# x-margin, and that margin is checkable per row EXACTLY: any out-of-window
# point p has |qx - px| >= min(qx - x_lo, x_hi - qx) =: margin (x_lo/x_hi
# the window's edge values, conservative because they lie inside), so
# dist(q, p) >= margin^2 — a row whose kth selected value is strictly below
# the (f32-shaved) margin^2 is certified exact. Failing rows tier up to the
# full-scan kernel; certified rows are bitwise the exact selection
# (indices/tie order; values up to XLA FMA discretion, as everywhere).
#
# Mosaic notes: window starts are passed in units of 128-LANE TILES and
# multiplied inside the kernel — a dynamic lane-axis slice start must be
# STATICALLY provably 128-aligned (raw offsets fail to compile: "cannot
# statically prove that index in dimension 1 is a multiple of 128").
# Extraction resolves ties by minimum ORIGINAL id (not window position —
# window order is x-rank order, which would break lax.top_k tie parity),
# reading the original ids from a windowed (1, W) plane.
#
# Measured (v5e, benchmarks/proto_window_slice.py, R=4096 W=16384 k=16 at
# n=65536): 2.09 ms vs the full-scan repair kernel's 7.71 ms — 3.7x.


def _pick_ti_window(W: int, n_pad: int, R: int) -> int:
    """Query-band height for the windowed kernel. Two constraints:
    (a) VMEM: two (ti, W) planes plus the ~10 lane-padded (·, n)
        point/mask/id planes under the same 9 MB cond-context cap as
        _pick_ti_queries;
    (b) RANK SPREAD: all ti rows of a program share ONE window (the
        dynamic slice start is a per-program scalar), so a tile of
        rank-sorted queries spanning ~n*ti/R ranks must stay well inside
        W or edge rows get no margin — cap the expected spread at W/4."""
    ti = _LANE
    while ti > 8 and 2 * ti * W * 4 + 10 * n_pad * 4 > 9 * 1024 * 1024:
        ti //= 2
    while ti > 8 and n_pad * ti > (R * W) // 4:
        ti //= 2
    return ti


def supports_pallas_knn_window(n: int, W: int) -> bool:
    n_pad = -(-n // _LANE) * _LANE
    return (
        W % _LANE == 0
        and W <= n_pad
        and 2 * 8 * W * 4 + 10 * n_pad * 4 <= 9 * 1024 * 1024
    )


def _knn_window_kernel(starts_ref, q_ref, qm_ref, pts_ref, pm_ref, ids_ref,
                       out_vals_ref, out_idx_ref,
                       *, W: int, n: int, n_real: int, k: int, c: int,
                       ti: int, has_mask: bool):
    ib = pl.program_id(0)
    ii = pl.program_id(1)
    s = starts_ref[ib, ii] * _LANE      # lane-tile units -> element offset
    i0 = ii * ti

    col_g = jax.lax.broadcasted_iota(jnp.int32, (ti, W), 1) + s
    ranking = jnp.zeros((ti, W), jnp.float32)
    for cc in range(c):
        xi_c = q_ref[0, pl.ds(i0, ti), cc].reshape(ti, 1)
        xj_c = pts_ref[0, cc, pl.ds(s, W)].reshape(1, W)
        d = xi_c - xj_c
        ranking = ranking + d * d
    if has_mask:
        mi = qm_ref[0, 0, pl.ds(i0, ti)].reshape(ti, 1)
        mj = pm_ref[0, 0, pl.ds(s, W)].reshape(1, W)
        ranking = jnp.where((mi * mj) > 0, ranking, MASKED_RANK_FILL)
    if n != n_real:
        ranking = jnp.where(col_g >= n_real, _PAD_FILL, ranking)

    ids_b = jnp.broadcast_to(
        ids_ref[0, 0, pl.ds(s, W)].reshape(1, W), (ti, W))
    big = jnp.int32(2**30)
    vals, idxs = [], []
    for _ in range(k):
        m = jnp.min(ranking, axis=1, keepdims=True)
        pid = jnp.min(jnp.where(ranking == m, ids_b, big), axis=1,
                      keepdims=True)
        vals.append(m)
        idxs.append(pid)
        ranking = jnp.where((ranking == m) & (ids_b == pid), _EVICT_FILL,
                            ranking)
    out_vals_ref[0, :, :] = jnp.concatenate(vals, axis=1)
    out_idx_ref[0, :, :] = jnp.concatenate(idxs, axis=1)


@functools.partial(jax.jit, static_argnames=("k", "W", "interpret",
                                             "has_mask"))
def _knn_window_call(queries, ranks, points_sorted, p_mask_sorted, orig_ids,
                     *, k, W, interpret, has_mask):
    b, r_real, c = queries.shape
    n_real = points_sorted.shape[1]
    n = -(-n_real // _LANE) * _LANE
    ti = _pick_ti_window(W, n, r_real)
    r = -(-r_real // ti) * ti
    q32 = queries.astype(jnp.float32)
    ranks = ranks.astype(jnp.int32)
    if r != r_real:
        q32 = jnp.pad(q32, ((0, 0), (0, r - r_real), (0, 0)))
        ranks = jnp.pad(ranks, ((0, 0), (0, r - r_real)), mode="edge")
    pts = points_sorted.astype(jnp.float32)
    ids = orig_ids.astype(jnp.int32)
    if n != n_real:
        pts = jnp.pad(pts, ((0, 0), (0, n - n_real), (0, 0)))
        ids = jnp.pad(ids, ((0, 0), (0, n - n_real)),
                      constant_values=n_real)
    ids = ids[:, None, :]          # (b, 1, n) plane for the kernel
    pts_t = jnp.swapaxes(pts, 1, 2)
    if has_mask:
        qm = jnp.ones((b, 1, r), jnp.int32)  # repair queries are valid rows
        pm = jnp.pad(p_mask_sorted.astype(jnp.int32),
                     ((0, 0), (0, n - n_real)))[:, None, :]
    else:
        qm = jnp.zeros((b, 1, r), jnp.int32)
        pm = jnp.zeros((b, 1, n), jnp.int32)

    # per-tile window start (lane-tile units), centered on the tile's middle
    # row's x-rank; clipped into the padded array
    mid = ranks[:, ti // 2::ti][:, : r // ti]              # (b, r//ti)
    starts = jnp.clip(mid - W // 2, 0, n - W) // _LANE
    starts = starts.astype(jnp.int32)

    grid = (b, r // ti)
    kernel = functools.partial(
        _knn_window_kernel, W=W, n=n, n_real=n_real, k=k, c=c, ti=ti,
        has_mask=has_mask)
    vals, idx = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, r, c), lambda ib, ii: (ib, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, r), lambda ib, ii: (ib, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, n), lambda ib, ii: (ib, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n), lambda ib, ii: (ib, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n), lambda ib, ii: (ib, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, ti, k), lambda ib, ii: (ib, ii, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ti, k), lambda ib, ii: (ib, ii, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, r, k), jnp.float32),
            jax.ShapeDtypeStruct((b, r, k), jnp.int32),
        ],
        interpret=interpret,
    )(starts, q32, qm, pts_t, pm, ids)

    # per-row x-margin for the caller's certificate: window edge VALUES are
    # conservative bounds on the nearest out-of-window x (edges lie inside)
    x_sorted = pts[:, :, 0]                                # (b, n)
    s_el = starts * _LANE                                  # (b, r//ti)
    x_lo_t = jnp.take_along_axis(x_sorted, s_el, axis=1)
    x_hi_t = jnp.take_along_axis(x_sorted, s_el + (W - 1), axis=1)
    nv = (p_mask_sorted.sum(axis=1).astype(jnp.int32)[:, None]
          if has_mask else jnp.full((b, 1), n_real, jnp.int32))
    inf = jnp.float32("inf")
    lo_inf = s_el == 0
    hi_inf = (s_el + W) >= nv
    rep = r // ti
    x_lo = jnp.repeat(x_lo_t, ti, axis=1)[:, :r_real]
    x_hi = jnp.repeat(x_hi_t, ti, axis=1)[:, :r_real]
    lo_inf = jnp.repeat(lo_inf, ti, axis=1)[:, :r_real]
    hi_inf = jnp.repeat(hi_inf, ti, axis=1)[:, :r_real]
    del rep
    qx = q32[:, :r_real, 0]
    m_lo = jnp.where(lo_inf, inf, qx - x_lo)
    m_hi = jnp.where(hi_inf, inf, x_hi - qx)
    margin = jnp.maximum(jnp.minimum(m_lo, m_hi), 0.0)
    margin = margin * jnp.float32(1.0 - 1e-4)   # f32 arithmetic shave
    return vals[:, :r_real], idx[:, :r_real], margin


def knn_select_window_pallas(
    queries: jnp.ndarray,          # (b, R, c) — VALID rows only
    ranks: jnp.ndarray,            # (b, R) int: each query's x-sort rank
    points_sorted: jnp.ndarray,    # (b, n, c) sorted ascending by x
    orig_ids: jnp.ndarray,         # (b, n) original index of each sorted row
    k: int,
    W: int,                        # static window width (multiple of 128)
    p_mask_sorted: Optional[jnp.ndarray] = None,  # (b, n) sorted point mask
    interpret: bool = False,
):
    """Windowed exact kNN of query rows against x-sorted points.

    Returns ``(vals, idx, margin)``: (b, R, k) ranking values and ORIGINAL
    indices, plus the per-row conservative x-margin. Rows with
    ``vals[:, k-1] < margin**2`` (and, under a mask, ``< 1e5``) are
    certified exact vs the full masked selection — indices and tie order
    bitwise lax.top_k's, values exact up to XLA FMA discretion. Queries
    must be valid (unmasked) rows; masked points are excluded by fill.
    For best window coverage sort the queries by rank so tile neighbors
    share windows."""
    return _knn_window_call(
        queries, ranks, points_sorted, p_mask_sorted, orig_ids,
        k=k, W=W, interpret=interpret, has_mask=p_mask_sorted is not None,
    )


def knn_select_queries_pallas(
    queries: jnp.ndarray,                 # (b, R, c)
    points: jnp.ndarray,                  # (b, n, c)
    k: int,
    q_mask: Optional[jnp.ndarray] = None,  # (b, R) query rows' own mask bits
    p_mask: Optional[jnp.ndarray] = None,  # (b, n) point mask
    interpret: bool = False,
):
    """Exact kNN of R QUERY rows against the full point set — the bucketed
    per-row REPAIR engine for the grid path's certificate (certified rows
    stay; the few that fail are recomputed here at O(R*n) instead of a
    whole-call exact fallback at O(n^2)).

    Semantics are exactly ``knn_select``'s no-adjacency ranking for those
    rows (egnn_pytorch.py:237-268 fill rules): squared distance,
    (q_mask_i & p_mask_j) failures filled at 1e5, ties by (value, column)
    = jax.lax.top_k order. The arithmetic (per-axis f32 difference-square
    accumulation, min/first-argmin/evict extraction) is the full-band
    kernel's verbatim, so output rows match the exact kernel: indices and
    tie order bitwise, values exact up to XLA FMA discretion (distinct
    expression graphs may differ in the last ulp — tests pin indices
    exactly, values at 1e-6; CLAUDE.md). Overwriting an already-certified
    row with its repair is therefore a no-op at the contract level (an
    exact-boundary valid_radius comparison could flip only within that
    ulp), which lets the repair bucket pad with arbitrary rows.
    """
    has_mask = q_mask is not None
    assert (p_mask is not None) == has_mask, "q_mask and p_mask come together"
    if not has_mask:
        q_mask = jnp.zeros(queries.shape[:2], jnp.int32)
        p_mask = jnp.zeros(points.shape[:2], jnp.int32)
    return _knn_query_call(queries, q_mask, points, p_mask, k=k,
                           interpret=interpret, has_mask=has_mask)


# ---------------------------------------------------------------------------
# j-tiled variant: any-n selection with O(ti*tj) VMEM
# ---------------------------------------------------------------------------
#
# The kernel above holds a full (TI, n) ranking band, capping n at ~8k
# (supports_pallas_knn_shapes); beyond that the jnp fallback materializes the
# (b, n, n) distance matrix in HBM (1 GB at n=16384). This variant adds a
# j-tile grid dimension: each step ranks a (TI, TJ) tile and folds its local
# top-k into a VMEM-resident running top-k via a tiny (TI, 2k) merge band.
# Same total VPU work as the full-band kernel, but memory is O(TI*TJ) — any
# n. Tie parity with jax.lax.top_k is preserved structurally: j-tiles are
# visited in ascending column order and the merge prefers the running
# (earlier-column) half on equal values, so equal-ranking winners keep
# lowest-column order.

_TJ = 4096  # j-tile width: bigger tiles -> fewer per-tile fixed costs.
# Round-1 measurements with RUNNING per-tile merges at n=16384 k=8 (v5e):
# tj=512 28 ms, 1024 15 ms, 2048 8.4 ms, 4096 5.7 ms (XLA dist+top_k
# fallback: 229 ms) — the tj sensitivity was the per-tile merges, which are
# narrow-band reductions with ~width-independent lane-shuffle cost. Round 2
# replaced them with ONE deferred merge over a (nj, ti, k) scratch:
# n=65536 k=16 went 183.5 -> 118.6 ms (the packed-key candidate variant
# below reaches 88.7 ms and is the no-adjacency auto default).
#
# Full-band vs tiled head-to-head (v5e, us, ROUND-1 numbers measured with
# the old running per-tile merges — the round-2 deferred merge makes the
# tiled column ~1.5-2x faster, so these are upper bounds for it; dispatch
# still keeps full-band wherever it fits, which remains correct for the
# k=8/16 flagship shapes; revisit only with fresh measurements):
#   n=1024 k=8: 41/47      n=1024 k=16: 83/42     n=2048 k=16: 177/192
#   n=4096 k=8: 253/206    n=4096 k=16: 463/392   n=8192 k=8: 866/1237
#   n=8192 k=16: 1608/2354 n=16384 k=8: 3291/5632


def supports_pallas_knn_tiled(n: int, k: int, backend=None) -> bool:
    if backend is None:
        backend = jax.default_backend()
    return backend == "tpu" and n >= _LANE and 1 <= k <= _LANE


def _extract_topk(band, col, k, n_sentinel):
    """k (min, first-argmin, evict) rounds; returns ((ti,k) vals, positions)."""
    vals, poss = [], []
    for _ in range(k):
        m = jnp.min(band, axis=1, keepdims=True)
        pos = jnp.min(jnp.where(band == m, col, n_sentinel), axis=1, keepdims=True)
        vals.append(m)
        poss.append(pos)
        band = jnp.where(col == pos, _EVICT_FILL, band)
    return jnp.concatenate(vals, axis=1), jnp.concatenate(poss, axis=1)


def _knn_tiled_kernel(coors_i_ref, coors_tj_ref, mask_i_ref, mask_j_ref,
                      adj_ref, out_vals_ref, out_idx_ref,
                      run_vals, run_idx,
                      *, n: int, n_real: int, k: int, c: int, ti: int, tj: int,
                      has_mask: bool, has_adj: bool):
    ii = pl.program_id(1)
    jj = pl.program_id(2)
    i0 = ii * ti
    j0 = jj * tj
    nj = pl.num_programs(2)

    col = jax.lax.broadcasted_iota(jnp.int32, (ti, tj), 1)

    # ---- (TI, TJ) ranking tile ----
    ranking = jnp.zeros((ti, tj), jnp.float32)
    for cc in range(c):
        xi_c = coors_i_ref[0, :, cc].reshape(ti, 1)
        xj_c = coors_tj_ref[0, cc, :].reshape(1, tj)
        d = xi_c - xj_c
        ranking = ranking + d * d
    if has_mask:
        mi = mask_i_ref[0, 0, :].reshape(ti, 1)
        mj = mask_j_ref[0, 0, :].reshape(1, tj)
        ranking = jnp.where((mi * mj) > 0, ranking, MASKED_RANK_FILL)
    if has_adj:
        row_g = jax.lax.broadcasted_iota(jnp.int32, (ti, tj), 0) + i0
        eye = row_g == (col + j0)
        at = adj_ref[0, :, :].astype(jnp.int32) > 0
        ranking = jnp.where(eye, -1.0, ranking)
        ranking = jnp.where(at & ~eye, 0.0, ranking)
    ranking = jnp.where((col + j0) >= n_real, _PAD_FILL, ranking)

    # ---- local top-k of this tile (global column ids) ----
    loc_vals, loc_pos = _extract_topk(ranking, col, k, tj)
    loc_idx = loc_pos + j0

    # ---- deposit; merge ONCE at the last tile ----
    # (running per-tile merges are narrow-band reductions whose lane-shuffle
    # cost is ~width-independent — nj merges cost ~nj x one merge and
    # dominated this kernel; see the packed-tiled variant's notes)
    run_vals[jj] = loc_vals
    run_idx[jj] = loc_idx

    @pl.when(jj == nj - 1)
    def _final_merge():
        vals_all = run_vals[...]                             # (nj, ti, k)
        idx_all = run_idx[...]
        # (tile, slot) order index: ties in value resolve to the lowest
        # (tile, slot), which is exactly ascending global column (tiles are
        # ascending j; within-tile slots emit ties in ascending column)
        ts = (jax.lax.broadcasted_iota(jnp.int32, (nj, ti, k), 0) * 128
              + jax.lax.broadcasted_iota(jnp.int32, (nj, ti, k), 2))
        big_i = jnp.int32(2**31 - 1)
        vs, cs = [], []
        for _ in range(k):
            m = jnp.min(vals_all, axis=(0, 2), keepdims=True)   # (1, ti, 1)
            at_m = vals_all == m
            t_sel = jnp.min(jnp.where(at_m, ts, big_i), axis=(0, 2),
                            keepdims=True)
            winner = at_m & (ts == t_sel)
            c_t = jnp.min(jnp.where(winner, idx_all, big_i), axis=(0, 2))
            vs.append(m[0])                                  # (ti, 1)
            cs.append(c_t.reshape(ti, 1))
            vals_all = jnp.where(winner, _EVICT_FILL, vals_all)
        out_vals_ref[0, :, :] = jnp.concatenate(vs, axis=1)
        out_idx_ref[0, :, :] = jnp.concatenate(cs, axis=1)


@functools.partial(
    jax.jit, static_argnames=("k", "interpret", "has_mask", "has_adj", "tj")
)
def _knn_tiled_call(coors, mask, adj_mat, *, k, interpret, has_mask, has_adj,
                    tj=_TJ):
    coors32, coors_t, mask_i32, adj_band, b, n_real, n, c = _prep_knn_inputs(
        coors, mask, adj_mat, has_mask, has_adj)
    tj = min(tj, n)
    while n % tj:
        tj //= 2
    # (TI, TJ) band + iota + evict copy + the (nj, TI, k) deferred-merge
    # scratch must fit the 16 MB scoped VMEM
    nj = n // tj
    ti = _LANE
    for cand in (512, 256, 128, 64):
        if (n % cand == 0
                and cand * (tj * 4 * 3 + nj * k * 4 * 3) <= 11 * 1024 * 1024):
            ti = cand
            break

    grid = (b, n // ti, n // tj)
    kernel = functools.partial(
        _knn_tiled_kernel, n=n, n_real=n_real, k=k, c=c, ti=ti, tj=tj,
        has_mask=has_mask, has_adj=has_adj,
    )
    vals, idx = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, ti, c), lambda ib, ii, jj: (ib, ii, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, tj), lambda ib, ii, jj: (ib, 0, jj),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, ti),
                         (lambda ib, ii, jj: (ib, 0, ii)) if has_mask
                         else (lambda ib, ii, jj: (ib, 0, 0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tj),
                         (lambda ib, ii, jj: (ib, 0, jj)) if has_mask
                         else (lambda ib, ii, jj: (ib, 0, 0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, ti, tj) if has_adj else (1, 8, _LANE),
                (lambda ib, ii, jj: (ib, ii, jj)) if has_adj
                else (lambda ib, ii, jj: (ib, 0, 0)),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec((1, ti, k), lambda ib, ii, jj: (ib, ii, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ti, k), lambda ib, ii, jj: (ib, ii, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n, k), jnp.float32),
            jax.ShapeDtypeStruct((b, n, k), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((nj, ti, k), jnp.float32),
            pltpu.VMEM((nj, ti, k), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=int(3 * b * n * n * c + 4 * b * n * n * k),
            bytes_accessed=int(b * n * (4 * c + 8 * k) + (b * n * n * 4 if has_adj else 0)),
            transcendentals=0,
        ),
        interpret=interpret,
    )(coors32, coors_t, mask_i32, mask_i32, adj_band)

    return vals[:, :n_real], idx[:, :n_real]


def knn_select_pallas_tiled(
    coors: jnp.ndarray,
    k: int,
    mask: Optional[jnp.ndarray] = None,
    adj_mat: Optional[jnp.ndarray] = None,
    interpret: bool = False,
    tj: int = _TJ,
):
    """Any-n top-k neighbor selection (j-tiled running top-k; same ranking
    rules and tie order as knn_select_pallas / jax.lax.top_k)."""
    return _knn_tiled_call(
        coors, mask, adj_mat, k=k, interpret=interpret,
        has_mask=mask is not None, has_adj=adj_mat is not None, tj=tj,
    )


# ---------------------------------------------------------------------------
# Packed-key candidate kernel: 3-op extraction rounds + exact XLA refine
# ---------------------------------------------------------------------------
#
# The extraction rounds above cost ~6 VPU ops/element/round (min-reduce,
# equality, select, argmin-reduce, evict compare, evict select) because ties
# force a separate first-argmin pass. This variant makes every band value
# UNIQUE by construction: the f32 ranking's top 18 bits (a monotonic
# truncation — bitcast of a non-negative float is order-preserving) are
# packed with the 14-bit column index into one int32:
#
#   packed = (bitcast(ranking) & ~0x3FFF) | col
#
# int32 < on packed values IS lexicographic (key18, col) order, so each round
# is just min + evict-by-equality (3 ops) and the winning column falls out of
# the minimum itself — no argmin pass, no index bookkeeping. The price: key18
# truncates the mantissa to 9 bits, so candidates are ordered by a COARSENED
# ranking. Exactness is restored OUTSIDE the kernel (ops/neighbors.py):
# extract kc = k + slack candidates, re-rank them with exact f32 values, and
# keep the top k. That refinement is provably exact whenever the candidate
# list covers every element whose key <= the k-th candidate's key, which
# reduces to the cheap per-row test  keys[kc-1] > keys[k-1]  (fewer than k
# elements can have key < key(true k-th value) by monotonicity); rows that
# fail (pathological key-tie pileups, e.g. >kc equidistant points or huge
# masked fills) trigger a lax.cond fallback to the exact kernels above.
# Measured (v5e, n=16384, k=16, kc=20): 3.6 ms vs 6.0 ms full-band exact.
#
# Adjacency fills are NOT supported here (their -1/0 fill ties are the
# pathological case by design — the exact kernels keep that path).

_COL_BITS = 14
_COL_MASK = (1 << _COL_BITS) - 1
_PACKED_MAX = 2**31 - 1  # plain int: a jnp scalar here would be captured
# by the kernel as an external constant, which pallas_call rejects

# Masked-pair SENTINEL keys, strictly above every real truncated key
# (f32 bitcast <= 0x7F7FFFFF, so bits>>14 <= 0x1FDFF and bits>>12 <= 0x7F7FF)
# and below the pad fill. Packing masked pairs with a key DISJOINT from real
# keys makes the refine's coverage certificate provably safe at the
# fill boundary: a tie group at the sentinel consists ONLY of masked fills,
# whose exact ranking values are all equal (MASKED_RANK_FILL), so col-order
# selection among them is already the reference's top_k order. Without this,
# any masked row would fail the certificate and force the exact fallback.
PACKED_MASK_SENTINEL = 0x1FF00        # full-band variant (18-bit keys)
PACKED_MASK_SENTINEL_TILED = 0x7F800  # tiled variant (20-bit keys)


def supports_pallas_knn_packed(n: int, kc: int, backend=None) -> bool:
    """Full-band VMEM budget, TPU-only, and the column index must fit the
    packed low bits (n <= 2^14)."""
    if backend is None:
        backend = jax.default_backend()
    return (
        backend == "tpu"
        and _LANE <= n <= (1 << _COL_BITS)
        and 1 <= kc <= _LANE
        and supports_pallas_knn_shapes(n)
    )


def _knn_packed_kernel(coors_ref, coors_t_ref, mask_ref,
                       out_keys_ref, out_cols_ref,
                       *, n: int, n_real: int, kc: int, c: int, ti: int,
                       has_mask: bool):
    i0 = pl.program_id(1) * ti
    col = jax.lax.broadcasted_iota(jnp.int32, (ti, n), 1)

    ranking = jnp.zeros((ti, n), jnp.float32)
    for cc in range(c):
        xi_c = coors_ref[0, pl.ds(i0, ti), cc].reshape(ti, 1)
        xj_c = coors_t_ref[0, cc, :].reshape(1, n)
        d = xi_c - xj_c
        ranking = ranking + d * d

    bits = jax.lax.bitcast_convert_type(ranking, jnp.int32)
    packed = (bits & jnp.int32(-(1 << _COL_BITS))) | col
    if has_mask:
        mi = mask_ref[0, 0, pl.ds(i0, ti)].reshape(ti, 1)
        mj = mask_ref[0, 0, :].reshape(1, n)
        sent = (jnp.int32(PACKED_MASK_SENTINEL) << jnp.int32(_COL_BITS)) | col
        packed = jnp.where((mi * mj) > 0, packed, sent)
    pmax = jnp.int32(_PACKED_MAX)
    if n != n_real:
        packed = jnp.where(col >= n_real, pmax, packed)

    outs = []
    for _ in range(kc):
        m = jnp.min(packed, axis=1, keepdims=True)
        outs.append(m)
        packed = jnp.where(packed == m, pmax, packed)
    pk = jnp.concatenate(outs, axis=1)                        # (ti, kc)
    out_cols_ref[0, :, :] = pk & jnp.int32(_COL_MASK)
    out_keys_ref[0, :, :] = jax.lax.shift_right_logical(pk, jnp.int32(_COL_BITS))


@functools.partial(jax.jit, static_argnames=("kc", "interpret", "has_mask"))
def _knn_packed_call(coors, mask, *, kc, interpret, has_mask):
    coors32, coors_t, mask_i32, _adj, b, n_real, n, c = _prep_knn_inputs(
        coors, mask, None, has_mask, False)
    ti = _pick_ti(n)
    grid = (b, n // ti)
    kernel = functools.partial(
        _knn_packed_kernel, n=n, n_real=n_real, kc=kc, c=c, ti=ti,
        has_mask=has_mask,
    )
    keys, cols = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, n, c), lambda ib, ii: (ib, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, n), lambda ib, ii: (ib, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, 1, mask_i32.shape[2]),
                lambda ib, ii: (ib, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec((1, ti, kc), lambda ib, ii: (ib, ii, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ti, kc), lambda ib, ii: (ib, ii, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n, kc), jnp.int32),
            jax.ShapeDtypeStruct((b, n, kc), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=int(3 * b * n * n * c + 3 * b * n * n * kc),
            bytes_accessed=int(b * n * (4 * c + 8 * kc)),
            transcendentals=0,
        ),
        interpret=interpret,
    )(coors32, coors_t, mask_i32)
    return keys[:, :n_real], cols[:, :n_real]


def knn_candidates_packed(
    coors: jnp.ndarray,
    kc: int,
    mask: Optional[jnp.ndarray] = None,
    interpret: bool = False,
):
    """Top-kc candidates under the COARSENED (18-bit key) ranking.

    Returns (keys, cols): (b, n, kc) int32 truncated ranking keys (ascending,
    possibly tied) and candidate columns (within equal keys, ascending — the
    exact lax.top_k tie order). Candidates provably contain the exact top-k
    for every row where keys[kc-1] > keys[k-1]; the caller checks and falls
    back (ops/neighbors.py:knn_select_gather).
    """
    return _knn_packed_call(
        coors, mask, kc=kc, interpret=interpret, has_mask=mask is not None,
    )


# ---------------------------------------------------------------------------
# Packed-key candidates, j-tiled: the any-n variant (the 65k regime's kernel)
# ---------------------------------------------------------------------------
#
# Same idea as the full-band packed kernel, tiled like knn_select_pallas_tiled
# so memory is O(TI*TJ) at any n. Within a (TI, TJ) tile the LOCAL column
# index needs only 12 bits (TJ <= 4096), leaving a 20-bit truncated key —
# MORE precise than the full-band variant's 18 bits. The key transform
# (bits >> 12 with the low bits masked) is identical across tiles, so running
# merges compare keys consistently; merges use the positional extraction
# (ties prefer the running half = earlier tiles = lower global columns),
# preserving the global (key, col) lexicographic order.
#
# Where it pays: extraction rounds are 3 ops/element instead of 6, on the
# O(n^2) band — at n=65536 (selection ~90% of the whole network step) this
# is the dominant-term cut that the 16k-regime refine overhead can't eat.
# Dispatch: ops/neighbors.py uses this for n > 16384 (full-band packed
# covers smaller n; exact kernels remain the <=16384 default per measured
# notes there).

_TCOL_BITS = 12
_TCOL_MASK = (1 << _TCOL_BITS) - 1


# Packed key for the DEFERRED merge: (key20 << 11) | (tile << 5) | slot.
# Each tile's local top-kc list is written into a (nj, ti, kc) scratch; ONE
# extraction pass at the last tile merges everything. Rationale (measured):
# per-tile running merges are dominated by narrow-band reductions whose
# lane-shuffle cost is ~width-independent, so merging nj times costs ~nj x
# one merge — at n=65536 that was MOST of the kernel time (tj=1024 ran 7x
# slower than tj=4096 purely from merge count). Tile order = ascending j and
# within-tile slots are (key, col)-ordered, so (key, tile, slot) lex order ==
# (key, global col) lex order and the merged result keeps exact
# lax.top_k tie semantics.
_MERGE_TILE_BITS = 6   # nj <= 64
_MERGE_SLOT_BITS = 5   # kc <= 32
_TPAD_KEY = 0xFFFFF    # 20-bit max: pad slots lose to every real/sentinel key


def _knn_packed_tiled_kernel(coors_i_ref, coors_tj_ref, mask_i_ref, mask_j_ref,
                             out_keys_ref, out_cols_ref,
                             keys_sc, cols_sc,
                             *, n: int, n_real: int, kc: int, c: int, ti: int,
                             tj: int, has_mask: bool):
    jj = pl.program_id(2)
    j0 = jj * tj
    nj = pl.num_programs(2)
    col = jax.lax.broadcasted_iota(jnp.int32, (ti, tj), 1)

    ranking = jnp.zeros((ti, tj), jnp.float32)
    for cc in range(c):
        xi_c = coors_i_ref[0, :, cc].reshape(ti, 1)
        xj_c = coors_tj_ref[0, cc, :].reshape(1, tj)
        d = xi_c - xj_c
        ranking = ranking + d * d

    bits = jax.lax.bitcast_convert_type(ranking, jnp.int32)
    packed = (bits & jnp.int32(-(1 << _TCOL_BITS))) | col
    if has_mask:
        mi = mask_i_ref[0, 0, :].reshape(ti, 1)
        mj = mask_j_ref[0, 0, :].reshape(1, tj)
        sent = (jnp.int32(PACKED_MASK_SENTINEL_TILED)
                << jnp.int32(_TCOL_BITS)) | col
        packed = jnp.where((mi * mj) > 0, packed, sent)
    pmax = jnp.int32(_PACKED_MAX)
    packed = jnp.where((col + j0) >= n_real, pmax, packed)

    # local kc extraction: 3-op rounds (packed values unique within the tile)
    outs = []
    for _ in range(kc):
        m = jnp.min(packed, axis=1, keepdims=True)
        outs.append(m)
        packed = jnp.where(packed == m, pmax, packed)
    pk = jnp.concatenate(outs, axis=1)                       # (ti, kc)
    loc_keys = jax.lax.shift_right_logical(pk, jnp.int32(_TCOL_BITS))
    loc_cols = (pk & jnp.int32(_TCOL_MASK)) + j0
    is_pad = pk == pmax
    loc_keys = jnp.where(is_pad, jnp.int32(_TPAD_KEY), loc_keys)
    loc_cols = jnp.where(is_pad, n, loc_cols)

    # deposit this tile's list; the slot index keeps within-tile order and
    # the tile index keeps across-tile order in the merged key
    slot = jax.lax.broadcasted_iota(jnp.int32, (ti, kc), 1)
    shift = jnp.int32(_MERGE_TILE_BITS + _MERGE_SLOT_BITS)
    keys_sc[jj] = (
        (loc_keys << shift) | (jj << jnp.int32(_MERGE_SLOT_BITS)) | slot
    )
    cols_sc[jj] = loc_cols

    @pl.when(jj == nj - 1)
    def _final_merge():
        band = keys_sc[...]                                  # (nj, ti, kc)
        cols_all = cols_sc[...]
        big = jnp.int32(_PACKED_MAX)
        ks, cs = [], []
        for _ in range(kc):
            m = jnp.min(band, axis=(0, 2), keepdims=True)    # (1, ti, 1)
            c_t = jnp.min(
                jnp.where(band == m, cols_all, big), axis=(0, 2)
            )                                                # (ti,)
            ks.append(m[0])                                  # (ti, 1)
            cs.append(c_t.reshape(ti, 1))
            band = jnp.where(band == m, big, band)
        out_keys_ref[0, :, :] = jax.lax.shift_right_logical(
            jnp.concatenate(ks, axis=1), shift)
        out_cols_ref[0, :, :] = jnp.concatenate(cs, axis=1)


def _packed_tiled_tj(n: int, tj: int = _TJ):
    """j-tile width for the packed-tiled kernel at lane-padded size ``n``,
    or None when the shape is out of reach.

    The deferred merge packs the tile index into 6 bits (nj <= 64) and the
    local column into 12 bits (tj <= 4096), so the grid must satisfy BOTH
    ``tj | n`` (every column scanned — a non-dividing tj would silently drop
    the tail columns) and ``n // tj <= 64``. Growth from the largest
    power-of-two divisor only proceeds while divisibility is preserved; for
    n whose odd part exceeds 64 (e.g. lane-padded 17024 = 128*133) no valid
    tj exists and callers must fall back to the exact tiled kernel."""
    tj = min(tj, n, 1 << _TCOL_BITS)
    while n % tj:
        tj //= 2
    while (n % (2 * tj) == 0 and n // tj > (1 << _MERGE_TILE_BITS)
           and tj < (1 << _TCOL_BITS)):
        tj *= 2
    if n % tj or n // tj > (1 << _MERGE_TILE_BITS):
        return None
    return tj


@functools.partial(
    jax.jit, static_argnames=("kc", "interpret", "has_mask", "tj")
)
def _knn_packed_tiled_call(coors, mask, *, kc, interpret, has_mask, tj=_TJ):
    coors32, coors_t, mask_i32, _adj, b, n_real, n, c = _prep_knn_inputs(
        coors, mask, None, has_mask, False)
    tj = _packed_tiled_tj(n, tj)
    assert tj is not None, (
        f"no dividing j-tile <= {1 << _TCOL_BITS} reaches nj <= "
        f"{1 << _MERGE_TILE_BITS} for n={n}; gate on "
        "supports_pallas_knn_packed_tiled"
    )
    assert kc <= (1 << _MERGE_SLOT_BITS), f"kc={kc} > {1 << _MERGE_SLOT_BITS}"
    # tighter budget than the exact tiled kernel: the packed band carries an
    # extra int32 copy (bits+packed) and the deferred-merge scratch
    ti = _LANE
    for cand in (512, 256, 128, 64):
        if n % cand == 0 and cand * tj * 4 * 4 <= 10 * 1024 * 1024:
            ti = cand
            break
    nj = n // tj

    grid = (b, n // ti, n // tj)
    kernel = functools.partial(
        _knn_packed_tiled_kernel, n=n, n_real=n_real, kc=kc, c=c, ti=ti,
        tj=tj, has_mask=has_mask,
    )
    keys, cols = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, ti, c), lambda ib, ii, jj: (ib, ii, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, tj), lambda ib, ii, jj: (ib, 0, jj),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, ti),
                         (lambda ib, ii, jj: (ib, 0, ii)) if has_mask
                         else (lambda ib, ii, jj: (ib, 0, 0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tj),
                         (lambda ib, ii, jj: (ib, 0, jj)) if has_mask
                         else (lambda ib, ii, jj: (ib, 0, 0)),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, ti, kc), lambda ib, ii, jj: (ib, ii, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ti, kc), lambda ib, ii, jj: (ib, ii, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n, kc), jnp.int32),
            jax.ShapeDtypeStruct((b, n, kc), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((nj, ti, kc), jnp.int32),
            pltpu.VMEM((nj, ti, kc), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=int(3 * b * n * n * c + 3 * b * n * n * kc),
            bytes_accessed=int(b * n * (4 * c + 8 * kc)),
            transcendentals=0,
        ),
        interpret=interpret,
    )(coors32, coors_t, mask_i32, mask_i32)
    return keys[:, :n_real], cols[:, :n_real]


def supports_pallas_knn_packed_tiled(n: int, kc: int, backend=None) -> bool:
    """TPU-only; the deferred merge caps nj at 64 tiles of <= 4096 columns,
    AND the lane-padded n must admit a dividing power-of-two j-tile within
    those caps (it does not when n's odd part exceeds 64, e.g. n=17000)."""
    if backend is None:
        backend = jax.default_backend()
    n_pad = -(-n // _LANE) * _LANE
    return (
        backend == "tpu"
        and n >= _LANE
        and 1 <= kc <= (1 << _MERGE_SLOT_BITS)
        and _packed_tiled_tj(n_pad) is not None
    )


def knn_candidates_packed_tiled(
    coors: jnp.ndarray,
    kc: int,
    mask: Optional[jnp.ndarray] = None,
    interpret: bool = False,
    tj: int = _TJ,
):
    """Any-n top-kc candidates under the coarsened (20-bit key) ranking —
    tiled running-merge variant of ``knn_candidates_packed``. Same coverage
    certificate, same caller-side exact refine."""
    return _knn_packed_tiled_call(
        coors, mask, kc=kc, interpret=interpret, has_mask=mask is not None,
        tj=tj,
    )
