"""Ring-rotated all-pairs pairwise computation for node-sharded dense EGNN.

The graph analog of ring attention (SURVEY.md §5.7/§2c): nodes are sharded
over a mesh axis; each device keeps its resident i-shard of
coordinates/projections and, over ``G = axis_size`` steps, computes the
(i-shard x visiting j-shard) interaction block while the j-shard payload
rotates around the ring via ``lax.ppermute`` over ICI. The n^2 interaction
set is covered without ever gathering the full node set on one device, and
each step's ppermute overlaps with the next block's compute under XLA's
async collectives.

Must run inside ``shard_map`` (or an equivalent axis context) with the node
dimension sharded on ``axis_name`` and parameters replicated — see
egnn_tpu/training/state.py:make_ring_denoise_train_step and
tests/test_ring.py. The reference has no distributed machinery at all
(SURVEY.md §2c); this module is TPU-native capability on top of the same
layer math (ops/pairwise_stream.py:pairwise_block).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..ops.pairwise_stream import PairwiseParams, PairwiseResult, pairwise_block


def ring_pairwise(
    coors: jnp.ndarray,        # (b, n_local, c)   — resident i-shard
    proj_i: jnp.ndarray,       # (b, n_local, hidden)
    proj_j: jnp.ndarray,       # (b, n_local, hidden)
    params: PairwiseParams,
    mask: Optional[jnp.ndarray] = None,   # (b, n_local) bool
    *,
    axis_name: str,
    fourier_features: int = 0,
    update_coors: bool = True,
    update_feats: bool = True,
    soft_edges: bool = False,
    norm_coors: bool = False,
    coor_weights_clamp_value: Optional[float] = None,
    coors_norm_eps: float = 1e-8,
    compute_dtype=None,
) -> PairwiseResult:
    """All-pairs messages for the local i-shard against every j-shard.

    Equivalent to ops/pairwise_stream.py:streamed_pairwise on the gathered
    node set, restricted to the local i rows — same masking order, same
    accumulation; only the j-iteration order differs (ring order vs ascending
    chunks), which changes floating-point summation order only.
    """
    g = jax.lax.axis_size(axis_name)
    perm = [(s, (s + 1) % g) for s in range(g)]  # send right around the ring

    # cross-ring accumulators stay >= f32 under bf16 compute_dtype, matching
    # pairwise_block's partial-sum dtype (bf16 counts saturate at 256)
    acc_dtype = jnp.promote_types(proj_i.dtype, jnp.float32)
    b, n_local, c = coors.shape
    m_dim = params.edge_w2.shape[-1]

    acc_m = jnp.zeros((b, n_local, m_dim), acc_dtype)
    acc_c = jnp.zeros((b, n_local, c), coors.dtype)
    acc_cnt = jnp.zeros((b, n_local), acc_dtype)

    # visiting payload starts as our own shard
    visiting = (coors, proj_j, mask if mask is not None else None)

    def block(carry, visiting):
        acc_m, acc_c, acc_cnt = carry
        coors_j, pj, mask_j = visiting
        pv = None
        if mask is not None:
            pv = mask[:, :, None] & mask_j[:, None, :]
        m_sum, c_delta, cnt = pairwise_block(
            coors, proj_i, coors_j, pj, pv, params,
            fourier_features=fourier_features,
            update_coors=update_coors,
            update_feats=update_feats,
            soft_edges=soft_edges,
            norm_coors=norm_coors,
            coor_weights_clamp_value=coor_weights_clamp_value,
            coors_norm_eps=coors_norm_eps,
            compute_dtype=compute_dtype,
        )
        return (acc_m + m_sum, acc_c + c_delta, acc_cnt + cnt)

    carry = (acc_m, acc_c, acc_cnt)
    for step in range(g):
        if step > 0:
            visiting = jax.tree.map(
                lambda x: jax.lax.ppermute(x, axis_name, perm), visiting
            )
        carry = block(carry, visiting)

    acc_m, acc_c, acc_cnt = carry
    return PairwiseResult(
        m_i=acc_m,
        coors_delta=acc_c,
        pair_count=acc_cnt if mask is not None else None,
    )
