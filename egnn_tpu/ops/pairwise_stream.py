"""Blockwise-streamed all-pairs EGNN messages (the long-context mechanism).

The reference's dense layer materializes every pairwise intermediate —
rel_coors (b,n,n,c), the edge-MLP input (b,n,n,2d+...) and m_ij (b,n,n,m)
(egnn_pytorch.py:232-315) — which caps n at a few thousand nodes. This module
computes the same math as a ``lax.scan`` over j-chunks: per chunk only
(b, n, CJ, ·) intermediates exist, and ``jax.checkpoint`` on the chunk body
makes the backward recompute per chunk instead of storing them. Peak memory
is O(n·CJ·H) for any n — the EGNN analog of blockwise/flash attention
(SURVEY.md §5.7).

The layer's edge-MLP first layer is factorized (see models/egnn.py docstring):
the caller passes per-node projections ``proj_i`` (with the bias folded in)
and ``proj_j``; only the rank-(2F+1) distance term stays pairwise.

Semantics parity with the reference's all-pairs branch (no kNN, no explicit
dense ``edges`` tensor): fourier features, soft-edge gate, CoorsNorm, clamp,
pair mask, sum/mean pooling. Dropout inside the pair MLP is not supported in
streaming mode (the caller falls back to the materialized path when
``dropout > 0`` and not deterministic).
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .core import fourier_encode_dist


class PairwiseParams(NamedTuple):
    """Weights of the pairwise message pipeline (names match models/egnn.py)."""

    w_d: jnp.ndarray                 # (dist_dim, hidden) distance rows of edge_mlp_0
    edge_w2: jnp.ndarray             # (hidden, m_dim)
    edge_b2: jnp.ndarray             # (m_dim,)
    gate_w: Optional[jnp.ndarray]    # (m_dim, 1) | None    — soft_edges
    gate_b: Optional[jnp.ndarray]
    coors_w1: Optional[jnp.ndarray]  # (m_dim, 4*m_dim) | None — update_coors
    coors_b1: Optional[jnp.ndarray]
    coors_w2: Optional[jnp.ndarray]  # (4*m_dim, 1)
    coors_b2: Optional[jnp.ndarray]
    cn_scale: Optional[jnp.ndarray]  # (1,) CoorsNorm scale | None


class PairwiseResult(NamedTuple):
    m_i: jnp.ndarray                  # (b, n, m_dim) pooled messages (sum; caller divides for mean)
    coors_delta: jnp.ndarray          # (b, n, c) Σ_j w_ij · rel_ij (0 if update_coors=False)
    pair_count: Optional[jnp.ndarray] # (b, n) valid-pair count per i (None without mask)


def _silu(x):
    return x * jax.nn.sigmoid(x)


def _auto_chunk(b: int, n: int, hidden: int, budget_bytes: int = 64 * 1024 * 1024) -> int:
    """Largest power-of-two j-chunk whose (b, n, CJ, hidden) f32 intermediate
    fits the budget."""
    cj = 128
    while cj > 8 and b * n * cj * hidden * 4 > budget_bytes:
        cj //= 2
    return cj


def pairwise_block(
    coors_i: jnp.ndarray,      # (b, ni, c)
    proj_i: jnp.ndarray,       # (b, ni, hidden) — feats_i @ W_i + edge_b1
    coors_j: jnp.ndarray,      # (b, nj, c)
    proj_j: jnp.ndarray,       # (b, nj, hidden) — feats_j @ W_j
    pair_valid,                # (b, ni, nj) bool or None (= all valid)
    params: PairwiseParams,
    *,
    fourier_features: int = 0,
    update_coors: bool = True,
    update_feats: bool = True,
    soft_edges: bool = False,
    norm_coors: bool = False,
    coor_weights_clamp_value: Optional[float] = None,
    coors_norm_eps: float = 1e-8,
):
    """One (i-block x j-block) of the dense pairwise pipeline: distance
    features -> edge MLP -> [gate] -> coordinate weights + message pooling.

    Returns partial sums ``(m_sum (b,ni,m), coors_delta (b,ni,c), count
    (b,ni))`` to be accumulated over j-blocks by the caller (the j-chunk scan
    below, or the ring steps in parallel/ring.py). Math and masking order
    mirror the reference's all-pairs branch (egnn_pytorch.py:282-333)."""
    dtype = proj_i.dtype
    b, ni, c = coors_i.shape

    rel = coors_i[:, :, None, :] - coors_j[:, None, :, :]   # (b, ni, nj, c)
    dist = jnp.sum(rel * rel, axis=-1)                      # (b, ni, nj)

    if fourier_features > 0:
        dist_feats = fourier_encode_dist(dist, num_encodings=fourier_features)
    else:
        dist_feats = dist[..., None]

    h1 = proj_i[:, :, None, :] + proj_j[:, None, :, :] + dist_feats @ params.w_d
    m_ij = _silu(_silu(h1) @ params.edge_w2 + params.edge_b2)   # (b, ni, nj, m)

    if soft_edges:
        m_ij = m_ij * jax.nn.sigmoid(m_ij @ params.gate_w + params.gate_b)

    m_dim = params.edge_w2.shape[-1]
    m_sum = jnp.zeros((b, ni, m_dim), dtype)
    coors_delta = jnp.zeros((b, ni, c), coors_i.dtype)
    count = jnp.zeros((b, ni), dtype)

    if update_coors:
        cw = _silu(m_ij @ params.coors_w1 + params.coors_b1)
        w_ij = (cw @ params.coors_w2 + params.coors_b2)[..., 0]   # (b, ni, nj)
        if norm_coors:
            norm = jnp.sqrt(
                jnp.clip(dist, min=coors_norm_eps * coors_norm_eps)
            )[..., None]
            rel_n = rel / norm * params.cn_scale
        else:
            rel_n = rel
        if pair_valid is not None:
            w_ij = jnp.where(pair_valid, w_ij, jnp.zeros((), dtype))
        if coor_weights_clamp_value is not None:
            cval = coor_weights_clamp_value
            w_ij = jnp.clip(w_ij, -cval, cval)
        coors_delta = jnp.einsum("bij,bijc->bic", w_ij, rel_n)

    if update_feats:
        if pair_valid is not None:
            m_ij = jnp.where(pair_valid[..., None], m_ij, jnp.zeros((), dtype))
            count = pair_valid.sum(axis=-1).astype(dtype)
        else:
            count = jnp.full((b, ni), m_ij.shape[-2], dtype)
        m_sum = m_ij.sum(axis=-2)

    return m_sum, coors_delta, count


def streamed_pairwise(
    coors: jnp.ndarray,        # (b, n, c)
    proj_i: jnp.ndarray,       # (b, n, hidden) — feats @ W_i + edge_b1
    proj_j: jnp.ndarray,       # (b, n, hidden) — feats @ W_j
    params: PairwiseParams,
    mask: Optional[jnp.ndarray] = None,   # (b, n) bool
    *,
    fourier_features: int = 0,
    update_coors: bool = True,
    update_feats: bool = True,
    soft_edges: bool = False,
    norm_coors: bool = False,
    coor_weights_clamp_value: Optional[float] = None,
    chunk: Optional[int] = None,
    coors_norm_eps: float = 1e-8,
) -> PairwiseResult:
    """All-pairs messages + aggregation without (n, n) HBM intermediates.

    Returns sum-pooled messages (mean pooling: divide by ``pair_count`` —
    reference masked-mean at egnn_pytorch.py:324-333), and the equivariant
    coordinate delta Σ_j w_ij·rel_ij (egnn_pytorch.py:315).
    """
    b, n, c = coors.shape
    hidden = proj_i.shape[-1]
    m_dim = params.edge_w2.shape[-1]
    dtype = proj_i.dtype

    cj = chunk or _auto_chunk(b, n, hidden)
    # pad n up to a multiple of the chunk; padded j's are masked out of every
    # accumulation below (they never contribute, mask or not).
    n_pad = -(-n // cj) * cj
    pad = n_pad - n

    coors_p = jnp.pad(coors, ((0, 0), (0, pad), (0, 0)))
    proj_j_p = jnp.pad(proj_j, ((0, 0), (0, pad), (0, 0)))
    jvalid = jnp.arange(n_pad) < n  # (n_pad,)
    if mask is not None:
        mask_j_p = jnp.pad(mask, ((0, 0), (0, pad)))

    num_chunks = n_pad // cj

    def chunk_body(carry, ci):
        acc_m, acc_c, acc_cnt = carry
        j0 = ci * cj
        coors_j = jax.lax.dynamic_slice(coors_p, (0, j0, 0), (b, cj, c))
        pj = jax.lax.dynamic_slice(proj_j_p, (0, j0, 0), (b, cj, hidden))
        jv = jax.lax.dynamic_slice(jvalid, (j0,), (cj,))

        # pair validity: real-j AND (mask_i & mask_j) when mask given
        # (reference order egnn_pytorch.py:292-300)
        pv = jnp.broadcast_to(jv[None, None, :], (b, n, cj))
        if mask is not None:
            mj = jax.lax.dynamic_slice(mask_j_p, (0, j0), (b, cj))
            pv = pv & (mask[:, :, None] & mj[:, None, :])

        m_sum, c_delta, cnt = pairwise_block(
            coors, proj_i, coors_j, pj, pv, params,
            fourier_features=fourier_features,
            update_coors=update_coors,
            update_feats=update_feats,
            soft_edges=soft_edges,
            norm_coors=norm_coors,
            coor_weights_clamp_value=coor_weights_clamp_value,
            coors_norm_eps=coors_norm_eps,
        )
        return (acc_m + m_sum, acc_c + c_delta, acc_cnt + cnt), None

    init = (
        jnp.zeros((b, n, m_dim), dtype),
        jnp.zeros((b, n, c), coors.dtype),
        jnp.zeros((b, n), dtype),
    )
    (acc_m, acc_c, acc_cnt), _ = jax.lax.scan(
        jax.checkpoint(chunk_body), init, jnp.arange(num_chunks)
    )

    return PairwiseResult(
        m_i=acc_m,
        coors_delta=acc_c,
        pair_count=acc_cnt if mask is not None else None,
    )
