"""Segment (scatter) reductions for the COO/sparse path.

TPU-native replacement for the reference's torch-scatter dependency
(egnn_pytorch_geometric.py:126, 248, 258 — PyG ``MessagePassing.aggregate``).
Built on ``jax.ops.segment_*`` which XLA lowers to efficient sorted-scatter;
all shapes static (edge counts padded + masked by the caller).

Semantics parity notes:
- ``add``/``sum``: plain segment sum; masked (padding) edges contribute 0.
- ``mean``: sum / count with count clamped like the reference's masked mean.
- ``max``: empty segments yield 0 (torch-scatter's fill value in PyG).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _apply_edge_mask(data: jnp.ndarray, mask: jnp.ndarray, fill) -> jnp.ndarray:
    """Zero/fill masked rows; handles both (E,) and (E, d) data (a blind
    ``mask[..., None]`` would mis-broadcast 1-D data to (E, E))."""
    m = mask if mask.ndim == data.ndim else mask[..., None]
    return jnp.where(m, data, fill)


def segment_sum(
    data: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_segments: int,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    if mask is not None:
        data = _apply_edge_mask(data, mask, jnp.zeros((), data.dtype))
    # TPU dispatch: the Pallas one-hot MXU kernel (ops/pallas/segment.py)
    # beats XLA's scatter ~2-2.4x when the segment count is moderate
    # (<= 2048; the in-register one-hot costs O(E*N) VPU work, so huge N
    # favors XLA scatter). Measured slope-based on v5e — see the kernel
    # docstring for numbers and the accuracy scheme (hi+lo bf16 split).
    if data.ndim == 2:
        from .pallas.segment import segment_sum_pallas, supports_pallas_segment_sum

        if supports_pallas_segment_sum(num_segments, data.shape[-1]):
            return segment_sum_pallas(data, segment_ids, num_segments)
    return jax.ops.segment_sum(data, segment_ids, num_segments=num_segments)


def batched_segment_sum(
    data: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_segments: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Per-graph segment sum: ``data`` (b, E, D) + ``segment_ids`` (b, E)
    with ids in [0, num_segments) -> (b, num_segments, D).

    Batched gathers have BLOCK-DIAGONAL segment structure (each graph's ids
    address only its own rows), so on TPU a vmapped one-hot MXU kernel keeps
    the per-call segment count at ``num_segments`` and stays on the Pallas
    path. Flattening to b*num_segments ids pushes past the kernel's segment
    cap onto XLA's scatter — the measured b=8 flagship layer-bwd regression
    (benchmarks/ab_b8_bwd.py: vmapped kernel 228 us vs flattened scatter
    463 us at (8, 8192, 36) -> 1024 segments on v5e)."""
    b, _, d = data.shape
    from .pallas.segment import (segment_sum_pallas,
                                 supports_pallas_segment_sum)

    if b > 1 and (interpret or supports_pallas_segment_sum(num_segments, d)):
        return jax.vmap(
            lambda dd, ii: segment_sum_pallas(dd, ii, num_segments, interpret)
        )(data, segment_ids.astype(jnp.int32))
    offs = (jnp.arange(b, dtype=segment_ids.dtype) * num_segments)[:, None]
    ids = (segment_ids + offs).reshape(-1)
    return segment_sum(
        data.reshape(-1, d), ids, b * num_segments
    ).reshape(b, num_segments, d)


def segment_count(
    segment_ids: jnp.ndarray,
    num_segments: int,
    mask: Optional[jnp.ndarray] = None,
    dtype=jnp.float32,
) -> jnp.ndarray:
    ones = jnp.ones(segment_ids.shape, dtype=dtype)
    if mask is not None:
        ones = jnp.where(mask, ones, jnp.zeros((), dtype))
    return jax.ops.segment_sum(ones, segment_ids, num_segments=num_segments)


def segment_mean(
    data: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_segments: int,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    total = segment_sum(data, segment_ids, num_segments, mask)
    count = segment_count(segment_ids, num_segments, mask, dtype=data.dtype)
    if total.ndim > count.ndim:  # (S, d) totals vs (S,) counts; 1-D data stays (S,)
        count = count[..., None]
    return total / jnp.clip(count, min=1.0)


def segment_max(
    data: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_segments: int,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    neg_inf = jnp.asarray(-jnp.inf, data.dtype)
    if mask is not None:
        data = _apply_edge_mask(data, mask, neg_inf)
    out = jax.ops.segment_max(data, segment_ids, num_segments=num_segments)
    # Empty segments come back as -inf; PyG/torch-scatter fill them with 0.
    return jnp.where(jnp.isneginf(out), jnp.zeros((), data.dtype), out)


def segment_aggregate(
    aggr: str,
    data: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_segments: int,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Dispatch matching EGNN_Sparse's ``aggr in {add, sum, max, mean}``
    (egnn_pytorch_geometric.py:123)."""
    if aggr in ("add", "sum"):
        return segment_sum(data, segment_ids, num_segments, mask)
    if aggr == "mean":
        return segment_mean(data, segment_ids, num_segments, mask)
    if aggr == "max":
        return segment_max(data, segment_ids, num_segments, mask)
    raise ValueError(f"unknown aggr {aggr!r}; must be add/sum/max/mean")


def segment_softmax(
    logits: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_segments: int,
    mask: Optional[jnp.ndarray] = None,
    axis_name: Optional[str] = None,
) -> jnp.ndarray:
    """Numerically-stable softmax within each segment (for sparse attention).

    ``axis_name``: when the packed node set is block-sharded over a mesh axis
    (parallel/sparse_partition.py layout), the per-segment max and the
    normalizer are combined across shards (pmax/psum over ICI), so every
    shard's rows are normalized by the GLOBAL per-graph statistics — the
    segmented analog of a sharded softmax."""
    neg_inf = jnp.asarray(-jnp.inf, logits.dtype)
    if mask is not None:
        logits = jnp.where(mask, logits, neg_inf)
    # The max shift only stabilizes the exp — softmax is invariant to it, so
    # its gradient is exactly zero; stop_gradient also sidesteps pmax having
    # no differentiation rule on the sharded path.
    seg_max = jax.lax.stop_gradient(
        jax.ops.segment_max(logits, segment_ids, num_segments=num_segments)
    )
    if axis_name is not None:
        seg_max = jax.lax.pmax(seg_max, axis_name)
    seg_max = jnp.where(jnp.isneginf(seg_max), jnp.zeros((), logits.dtype), seg_max)
    shifted = logits - seg_max[segment_ids]
    exp = jnp.exp(shifted)
    if mask is not None:
        exp = jnp.where(mask, exp, jnp.zeros((), exp.dtype))
    denom = jax.ops.segment_sum(exp, segment_ids, num_segments=num_segments)
    if axis_name is not None:
        denom = jax.lax.psum(denom, axis_name)
    return exp / jnp.clip(denom[segment_ids], min=jnp.finfo(exp.dtype).tiny)


def graph_layer_norm(
    x: jnp.ndarray,
    batch: Optional[jnp.ndarray],
    num_graphs: int,
    gamma: Optional[jnp.ndarray],
    beta: Optional[jnp.ndarray],
    eps: float = 1e-5,
    node_mask: Optional[jnp.ndarray] = None,
    axis_name: Optional[str] = None,
    uniform_size: Optional[int] = None,
) -> jnp.ndarray:
    """PyG-style graph-mode LayerNorm (torch_geometric.nn.norm.LayerNorm,
    mode='graph', used at egnn_pytorch_geometric.py:156): statistics over all
    node x channel entries of each graph, biased variance.

    ``axis_name``: when the packed node set is sharded over a mesh axis
    (edge-partitioned sparse path, parallel/sparse_partition.py), per-graph
    statistics are psum'd over that axis so every shard normalizes with the
    GLOBAL per-graph mean/variance.

    ``uniform_size``: POSITIONAL contract — rows [g*s, (g+1)*s) all belong to
    graph g (contiguous ``batch`` with equal graph sizes, the layout every
    batched builder in this repo emits). Statistics then reduce by reshape
    instead of segment-scatter + per-node index gathers, which measured
    69.0 us fwd+bwd at (1024, 64)/32 graphs on v5e for the general path —
    segment ops and (n,)-row gathers are index-bound, a (g, s*d) reshape
    reduction is a plain vectorized sum. Same math, float reduction order
    differs (tolerance-level). Ignored under ``axis_name`` (sharded stats
    keep the segment path)."""
    n, d = x.shape
    if batch is None:
        batch = jnp.zeros((n,), dtype=jnp.int32)
        num_graphs = 1
    if uniform_size is not None and axis_name is None:
        s = uniform_size
        assert n == num_graphs * s, (
            f"uniform_size={s} needs n = num_graphs*s = {num_graphs * s}, got {n}"
        )
        xr = x.reshape(num_graphs, s * d)
        if node_mask is not None:
            mr = jnp.repeat(node_mask.reshape(num_graphs, s), d, axis=1)
            cnt = jnp.clip(mr.sum(axis=1, dtype=x.dtype), min=1.0)[:, None]
            xm = jnp.where(mr, xr, jnp.zeros((), x.dtype))
        else:
            cnt = jnp.asarray(s * d, x.dtype)
            xm = xr
        mean = xm.sum(axis=1, keepdims=True) / cnt
        centered = xr - mean
        if node_mask is not None:
            centered = jnp.where(mr, centered, jnp.zeros((), x.dtype))
        var = (centered ** 2).sum(axis=1, keepdims=True) / cnt
        out = ((xr - mean) * jax.lax.rsqrt(var + eps)).reshape(n, d)
        if gamma is not None:
            out = out * gamma
        if beta is not None:
            out = out + beta
        return out
    psum = (lambda v: jax.lax.psum(v, axis_name)) if axis_name else (lambda v: v)
    count = psum(segment_count(batch, num_graphs, node_mask, dtype=x.dtype)) * d
    count = jnp.clip(count, min=1.0)
    total = psum(segment_sum(x, batch, num_graphs, node_mask).sum(axis=-1))
    mean = (total / count)[batch][:, None]
    centered = x - mean
    if node_mask is not None:
        centered = jnp.where(node_mask[:, None], centered, jnp.zeros((), x.dtype))
    sq = psum(segment_sum(centered**2, batch, num_graphs, node_mask).sum(axis=-1))
    var = (sq / count)[batch][:, None]
    out = (x - mean) * jax.lax.rsqrt(var + eps)
    if gamma is not None:
        out = out * gamma
    if beta is not None:
        out = out + beta
    return out


def uniform_aggregate(
    aggr: str,
    data: jnp.ndarray,
    degree: int,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Aggregation for receiver-major UNIFORM-DEGREE edge layouts.

    Contract: edge rows [i*degree, (i+1)*degree) all belong to receiver i —
    by POSITION, regardless of the receiver-id array (masked padding rows
    stay in their slot and contribute nothing). Every ops/graph.py kNN
    builder emits exactly this layout with degree=k, as does
    native.batched_knn_graph_np.

    With a static degree the segment reduction is a dense reshape-reduce:
    no scatter in the forward and no scatter-add transpose in the backward
    (the gradient of a reshape-sum is a broadcast). Matches
    ``segment_aggregate(aggr, data, repeat(arange(n), degree), n, mask)``
    exactly, including PyG's mean (divide by valid count, min 1) and max
    (empty segments -> 0) conventions.
    """
    e, w = data.shape
    n = e // degree
    assert n * degree == e, f"edge count {e} not divisible by degree {degree}"
    d3 = data.reshape(n, degree, w)
    m3 = None if mask is None else mask.reshape(n, degree, 1)
    if aggr in ("add", "sum", "mean"):
        if m3 is not None:
            s = jnp.where(m3, d3, jnp.zeros((), data.dtype)).sum(axis=1)
        else:
            s = d3.sum(axis=1)
        if aggr == "mean":
            if m3 is not None:
                cnt = m3.sum(axis=1).astype(data.dtype)
                s = s / jnp.clip(cnt, min=1.0)
            else:
                s = s / degree
        return s
    if aggr == "max":
        neg_inf = jnp.asarray(-jnp.inf, data.dtype)
        if m3 is not None:
            d3 = jnp.where(m3, d3, neg_inf)
        out = d3.max(axis=1)
        return jnp.where(jnp.isneginf(out), jnp.zeros((), data.dtype), out)
    raise ValueError(f"unknown aggr {aggr!r}; must be add/sum/max/mean")
