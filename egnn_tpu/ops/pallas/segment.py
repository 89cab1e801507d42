"""Segment-sum (scatter-add) as a Pallas TPU kernel.

The sparse/COO path's aggregation — PyG's torch-scatter C++/CUDA kernels in
the reference (egnn_pytorch_geometric.py:248, 258) — becomes, in XLA, a
scatter-add, which TPUs execute as a slow serialized update stream. This
kernel instead streams destination-id/message tiles through VMEM and
accumulates ``onehot(dst_tile)^T @ msgs_tile`` into the resident (N, D)
output block on the MXU: the one-hot tile is generated in-register (never
touches HBM), the matmul is exactly the systolic array's shape, and grid
steps accumulate sequentially into the same output block.

MEASURED OUTCOME (v5e, 2026-08): this kernel LOSES to XLA's scatter on
destination-sorted edge lists at every realistic size (0.15x at E=8192/
N=1024/D=16 up to 0.95x at E=65536/N=1024/D=64), because generating the
(TE, N) one-hot costs O(E*N) VPU work while sorted scatter is O(E*D). It is
therefore NOT dispatched by ops/segment.py — the shipped fast path is edge
layout co-design (receiver-major edges from every ops/graph.py builder) +
XLA's native sorted scatter. Kept as a tested building block; it can win
only when N is tiny and edges cannot be sorted.

Works for ANY destination order (the one-hot contraction is order-blind) —
no sorting requirement, unlike range-based scatter kernels. Padding edges
must carry zeroed messages (the caller masks them; dst id is then harmless).

Gradient: segment-sum's vjp is a gather, d_msgs = g_out[dst] — one XLA gather,
no custom kernel needed (registered via custom_vjp below).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128
_TE = 1024           # edges per tile
_VMEM_OUT_BUDGET = 8 * 1024 * 1024


def supports_pallas_segment_sum(
    num_segments: int, feat_dim: int, backend: Optional[str] = None
) -> bool:
    if backend is None:
        backend = jax.default_backend()
    out_bytes = num_segments * max(feat_dim, 1) * 4
    return (
        backend not in ("cpu",)
        and out_bytes <= _VMEM_OUT_BUDGET
        and num_segments <= 64 * 1024  # one-hot tile must keep te >= 128
        and feat_dim >= 1
    )


def _seg_kernel(dst_ref, msg_ref, out_ref, *, n: int, te: int):
    et = pl.program_id(0)

    @pl.when(et == 0)
    def _():
        out_ref[:, :] = jnp.zeros_like(out_ref)

    dst = dst_ref[0, :].reshape(te, 1)                       # (TE, 1)
    seg_ids = jax.lax.broadcasted_iota(jnp.int32, (te, n), 1)
    onehot = (dst == seg_ids).astype(jnp.float32)            # (TE, N) in-register
    # contract over the edge axis: (TE, N)^T @ (TE, D) -> (N, D) on the MXU
    out_ref[:, :] += jax.lax.dot_general(
        onehot,
        msg_ref[:, :],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def segment_sum_pallas(data, segment_ids, num_segments: int, interpret: bool = False):
    """Sum ``data`` (E, D) into ``num_segments`` rows keyed by ``segment_ids``
    (E,) int32. f32 accumulate; returns (num_segments, D) in data's dtype."""
    return _seg_fwd_impl(data, segment_ids, num_segments, interpret)


@functools.partial(jax.jit, static_argnames=("num_segments", "interpret"))
def _seg_fwd_impl(data, segment_ids, num_segments, interpret):
    e, d = data.shape
    te = min(_TE, max(_LANE, 1 << (e - 1).bit_length()))
    # the in-register one-hot tile is (te, num_segments) f32 — cap it at 4 MB
    while te > _LANE and te * num_segments * 4 > 4 * 1024 * 1024:
        te //= 2
    e_pad = -(-e // te) * te
    data32 = data.astype(jnp.float32)
    if e_pad != e:
        data32 = jnp.pad(data32, ((0, e_pad - e), (0, 0)))
    # padded edges: dst -1 matches no segment id -> zero one-hot row
    ids = jnp.pad(
        segment_ids.astype(jnp.int32), (0, e_pad - e), constant_values=-1
    )[None, :]

    out = pl.pallas_call(
        functools.partial(_seg_kernel, n=num_segments, te=te),
        grid=(e_pad // te,),
        in_specs=[
            pl.BlockSpec((1, te), lambda et: (0, et), memory_space=pltpu.VMEM),
            pl.BlockSpec((te, d), lambda et: (et, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (num_segments, d), lambda et: (0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((num_segments, d), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * e_pad * num_segments * d,
            bytes_accessed=e_pad * (4 + 4 * d) + num_segments * d * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(ids, data32)
    return out.astype(data.dtype)


def _seg_fwd(data, segment_ids, num_segments, interpret):
    out = _seg_fwd_impl(data, segment_ids, num_segments, interpret)
    return out, segment_ids


def _seg_bwd(num_segments, interpret, segment_ids, g):
    # vjp of segment-sum: gather the output cotangent back to the edges
    return g[segment_ids], None


segment_sum_pallas.defvjp(_seg_fwd, _seg_bwd)
