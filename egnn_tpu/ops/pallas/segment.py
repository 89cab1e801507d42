"""Segment-sum (scatter-add) as a Pallas TPU kernel.

The sparse/COO path's aggregation — PyG's torch-scatter C++/CUDA kernels in
the reference (egnn_pytorch_geometric.py:248, 258) — becomes, in XLA, a
scatter-add, which TPUs execute as a slow serialized update stream. This
kernel instead streams destination-id/message tiles through VMEM and
accumulates ``onehot(dst_tile)^T @ msgs_tile`` into the resident (N, D)
output block on the MXU: the one-hot tile is generated in-register (never
touches HBM), the matmul is exactly the systolic array's shape, and grid
steps accumulate sequentially into the same output block.

MEASURED (v5e, slope-based timing that cancels the ~30 ms/dispatch tunnel
overhead — see utils/profiling.py:measure_op): 2.4x over XLA scatter at
E=8192/N=1024/D=16 (26 vs 62 us), 2.0x at E=65536/N=1024/D=64 (228 vs
457 us); loses (0.6x) at N=4096 because the in-register one-hot costs
O(E*N) VPU work. ops/segment.py therefore dispatches here when
num_segments <= 2048 (see supports_pallas_segment_sum).

Accuracy: one-hot values are exact in bf16, so only the message operand
would lose bits in a bf16 MXU pass; messages are split hi+lo into two bf16
matmuls with f32 accumulation — max err ~1e-5 vs f64, at 2x bf16 cost
(Precision.HIGHEST costs 3x+ and erased the win).

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
        backend == "tpu"  # Mosaic kernels are TPU-only
        and out_bytes <= _VMEM_OUT_BUDGET
        # crossover vs XLA scatter: the one-hot tile costs O(E*N) VPU work,
        # measured win for N <= ~2048 on v5e
        and num_segments <= 2048
        and feat_dim >= 1
    )


def _seg_kernel(dst_ref, msg_ref, out_ref, *, n: int, te: int):
    et = pl.program_id(0)

    @pl.when(et == 0)
    def _():
        out_ref[:, :] = jnp.zeros_like(out_ref)

    dst = dst_ref[0, :].reshape(te, 1)                       # (TE, 1)
    seg_ids = jax.lax.broadcasted_iota(jnp.int32, (te, n), 1)
    # One-hot values (0/1) are EXACT in bf16, so only the message operand
    # loses bits in a bf16 MXU pass. Split messages into hi+lo bf16 halves
    # and run two bf16 matmuls with f32 accumulation: ~f32 accuracy at 2x
    # bf16 cost (vs 3-6x for Precision.HIGH/HIGHEST on both operands).
    onehot = (dst == seg_ids).astype(jnp.bfloat16)           # (TE, N) in-register
    msg = msg_ref[:, :]
    hi = msg.astype(jnp.bfloat16)
    lo = (msg - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    dn = (((0,), (0,)), ((), ()))  # contract over the edge axis -> (N, D)
    # precision pinned explicitly: operands are already bf16 by construction
    # (the hi+lo split IS the precision scheme), and a global
    # jax_default_matmul_precision=float32 would otherwise push an fp32
    # contract onto bf16 vectors, which Mosaic rejects ("Bad lhs type").
    _prec = jax.lax.Precision.DEFAULT
    acc = jax.lax.dot_general(onehot, hi, dn, preferred_element_type=jnp.float32,
                              precision=_prec)
    acc += jax.lax.dot_general(onehot, lo, dn, preferred_element_type=jnp.float32,
                               precision=_prec)
    out_ref[:, :] += acc


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
