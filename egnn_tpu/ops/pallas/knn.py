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


def _pick_ti(n: int) -> int:
    """Row-band height: keep the (TI, n) f32 band + int32 iota + adj band
    comfortably inside VMEM (~12 MB budget)."""
    budget = 12 * 1024 * 1024
    for ti in (512, 256, 128):
        if n % ti == 0 and ti * n * 4 * 3 <= budget:
            return ti
    return _LANE  # n is always a multiple of _LANE


def supports_pallas_knn_shapes(n: int) -> bool:
    """Whether the (ti, n) ranking band of the smallest tile height still fits
    the VMEM budget (beyond that, fall back to the jnp path rather than fail
    Mosaic compilation)."""
    n_pad = -(-n // _LANE) * _LANE
    return _LANE * n_pad * 4 * 3 <= 12 * 1024 * 1024


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
        at = adj_ref[0, :, :] > 0
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
    jax.jit, static_argnames=("k", "interpret", "has_mask", "has_adj")
)
def _knn_call(coors, mask, adj_mat, *, k, interpret, has_mask, has_adj):
    b, n_real, c = coors.shape
    n = -(-n_real // _LANE) * _LANE
    pad = n - n_real
    ti = _pick_ti(n)

    coors32 = coors.astype(jnp.float32)
    if pad:
        coors32 = jnp.pad(coors32, ((0, 0), (0, pad), (0, 0)))
    coors_t = jnp.swapaxes(coors32, 1, 2)  # (b, c, n) — lane-contiguous j reads

    if has_mask:
        mask_i32 = jnp.pad(mask.astype(jnp.int32), ((0, 0), (0, pad)))[:, None, :]
    else:
        mask_i32 = jnp.zeros((b, 1, _LANE), jnp.int32)  # dummy, never read
    if has_adj:
        adj_i32 = jnp.pad(adj_mat.astype(jnp.int32), ((0, 0), (0, pad), (0, pad)))
    else:
        adj_i32 = jnp.zeros((b, 8, _LANE), jnp.int32)  # dummy, never read

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
                (1, ti, adj_i32.shape[2]) if has_adj else (1, 8, _LANE),
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
    )(coors32, coors_t, mask_i32, adj_i32)

    return vals[:, :n_real], idx[:, :n_real]


def knn_select_pallas(
    coors: jnp.ndarray,
    k: int,
    mask: Optional[jnp.ndarray] = None,
    adj_mat: Optional[jnp.ndarray] = None,
    interpret: bool = False,
):
    """Top-k neighbor selection under the reference's ranking rules.

    Args:
      coors: (b, n, c) coordinates (any float dtype; ranking runs in f32).
      k: static neighbor count (``num_nearest_neighbors``).
      mask: optional (b, n) bool node mask.
      adj_mat: optional (b, n, n) bool adjacency (self/adjacent overrides).
      interpret: run in the Pallas interpreter (CPU testing).

    Returns:
      (vals, idx): (b, n, k) f32 winning ranking values (ascending) and
      (b, n, k) int32 neighbor indices.
    """
    return _knn_call(
        coors, mask, adj_mat, k=k, interpret=interpret,
        has_mask=mask is not None, has_adj=adj_mat is not None,
    )
