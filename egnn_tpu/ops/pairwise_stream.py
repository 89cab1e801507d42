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
pair mask, sum/mean pooling, dropout (per-chunk RNG derived by fold_in from
one base key, so dropout>0 training keeps the O(n*chunk) memory path), and
``compute_dtype`` mixed precision (the message MLP runs in e.g. bf16 while
ALL geometry — rel_coors, distances, CoorsNorm, coordinate weighting and the
cross-chunk accumulators — stays f32, the same contract as the materialized
path in models/egnn.py).
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
    compute_dtype=None,
    dropout_rate: float = 0.0,
    dropout_rng=None,
):
    """One (i-block x j-block) of the dense pairwise pipeline: distance
    features -> edge MLP -> [gate] -> coordinate weights + message pooling.

    Returns partial sums ``(m_sum (b,ni,m), coors_delta (b,ni,c), count
    (b,ni))`` to be accumulated over j-blocks by the caller (the j-chunk scan
    below, or the ring steps in parallel/ring.py). Math and masking order
    mirror the reference's all-pairs branch (egnn_pytorch.py:282-333).

    ``compute_dtype`` casts the message MLP (h1, m_ij, gate, coordinate-weight
    MLP) like models/egnn.py's materialized branch; geometry stays f32 and
    coordinate weights are cast back before weighting rel_coors. With
    ``dropout_rate > 0`` and a ``dropout_rng``, inverted dropout is applied at
    the reference positions (after edge_mlp layer 1 and coors_mlp layer 1,
    egnn_pytorch.py:178-208)."""
    # cross-chunk/cross-ring partial sums are accumulated by the caller over
    # many blocks — keep them >= f32 even when compute_dtype (and hence
    # proj_i) is bf16: bf16 cannot represent integer counts above 256 and
    # running message sums drift
    acc_dtype = jnp.promote_types(proj_i.dtype, jnp.float32)
    b, ni, c = coors_i.shape
    mp = (
        (lambda x: x.astype(compute_dtype))
        if compute_dtype is not None
        else (lambda x: x)
    )
    if dropout_rate > 0.0 and dropout_rng is not None:
        r1, r2 = jax.random.split(dropout_rng)
        keep_p = 1.0 - dropout_rate

        def drop(x, r):
            keep = jax.random.bernoulli(r, keep_p, x.shape)
            return jnp.where(keep, x / jnp.asarray(keep_p, x.dtype),
                             jnp.zeros((), x.dtype))
    else:
        r1 = r2 = None
        drop = lambda x, r: x

    rel = coors_i[:, :, None, :] - coors_j[:, None, :, :]   # (b, ni, nj, c)
    dist = jnp.sum(rel * rel, axis=-1)                      # (b, ni, nj)

    if fourier_features > 0:
        dist_feats = fourier_encode_dist(dist, num_encodings=fourier_features)
    else:
        dist_feats = dist[..., None]

    h1 = (mp(proj_i)[:, :, None, :] + mp(proj_j)[:, None, :, :]
          + mp(dist_feats) @ mp(params.w_d))
    m_ij = _silu(drop(h1, r1))
    m_ij = _silu(m_ij @ mp(params.edge_w2) + mp(params.edge_b2))  # (b,ni,nj,m)

    if soft_edges:
        m_ij = m_ij * jax.nn.sigmoid(m_ij @ mp(params.gate_w) + mp(params.gate_b))

    m_dim = params.edge_w2.shape[-1]
    m_sum = jnp.zeros((b, ni, m_dim), acc_dtype)
    coors_delta = jnp.zeros((b, ni, c), coors_i.dtype)
    count = jnp.zeros((b, ni), acc_dtype)

    if update_coors:
        cw = _silu(drop(m_ij @ mp(params.coors_w1) + mp(params.coors_b1), r2))
        # back to full precision BEFORE weighting geometry (models/egnn.py)
        w_ij = (cw @ mp(params.coors_w2) + mp(params.coors_b2))[..., 0].astype(
            coors_i.dtype
        )   # (b, ni, nj)
        if norm_coors:
            norm = jnp.sqrt(
                jnp.clip(dist, min=jnp.asarray(coors_norm_eps * coors_norm_eps,
                                               dist.dtype))
            )[..., None]
            rel_n = rel / norm * params.cn_scale.astype(rel.dtype)
        else:
            rel_n = rel
        if pair_valid is not None:
            w_ij = jnp.where(pair_valid, w_ij, jnp.zeros((), w_ij.dtype))
        if coor_weights_clamp_value is not None:
            cval = coor_weights_clamp_value
            w_ij = jnp.clip(w_ij, -cval, cval)
        coors_delta = jnp.einsum("bij,bijc->bic", w_ij, rel_n)

    if update_feats:
        if pair_valid is not None:
            m_ij = jnp.where(pair_valid[..., None], m_ij,
                             jnp.zeros((), m_ij.dtype))
            count = pair_valid.sum(axis=-1).astype(acc_dtype)
        else:
            count = jnp.full((b, ni), m_ij.shape[-2], acc_dtype)
        # cross-chunk accumulators stay full precision regardless of
        # compute_dtype (bf16 running sums over many chunks drift)
        m_sum = m_ij.sum(axis=-2).astype(acc_dtype)

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
    compute_dtype=None,
    dropout_rate: float = 0.0,
    dropout_rng=None,
) -> PairwiseResult:
    """All-pairs messages + aggregation without (n, n) HBM intermediates.

    Returns sum-pooled messages (mean pooling: divide by ``pair_count`` —
    reference masked-mean at egnn_pytorch.py:324-333), and the equivariant
    coordinate delta Σ_j w_ij·rel_ij (egnn_pytorch.py:315).

    Dropout: each j-chunk derives its key as fold_in(dropout_rng, chunk), so
    a fixed base key is fully deterministic while masks stay independent
    across chunks — dropout>0 training keeps O(n*chunk) memory (no fallback
    to the materialized path).
    """
    b, n, c = coors.shape
    hidden = proj_i.shape[-1]
    m_dim = params.edge_w2.shape[-1]
    # match pairwise_block's partial-sum dtype: >= f32 even under bf16
    # compute_dtype (bf16 counts saturate at 256; running sums drift)
    acc_dtype = jnp.promote_types(proj_i.dtype, jnp.float32)

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

        rng_c = (
            jax.random.fold_in(dropout_rng, ci)
            if (dropout_rate > 0.0 and dropout_rng is not None)
            else None
        )
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
            dropout_rate=dropout_rate,
            dropout_rng=rng_c,
        )
        return (acc_m + m_sum, acc_c + c_delta, acc_cnt + cnt), None

    init = (
        jnp.zeros((b, n, m_dim), acc_dtype),
        jnp.zeros((b, n, c), coors.dtype),
        jnp.zeros((b, n), acc_dtype),
    )
    (acc_m, acc_c, acc_cnt), _ = jax.lax.scan(
        jax.checkpoint(chunk_body), init, jnp.arange(num_chunks)
    )

    return PairwiseResult(
        m_i=acc_m,
        coors_delta=acc_c,
        pair_count=acc_cnt if mask is not None else None,
    )
