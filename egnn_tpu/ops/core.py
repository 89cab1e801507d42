"""Primitive numerics shared by the dense and sparse EGNN paths.

These functions reproduce the *behavior* of the reference library's helpers
(`/root/reference/egnn_pytorch/egnn_pytorch.py:10-77`) with JAX/XLA-idiomatic
implementations: pure functions, static shapes, no in-place mutation.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def exists(val) -> bool:
    return val is not None


def default_float():
    """Default floating dtype honoring jax_enable_x64 (f64 in tests, f32 in prod)."""
    return jnp.zeros((), dtype=float).dtype


def safe_div(num: jnp.ndarray, den: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Masked-mean division: clamp denominator to ``eps``, zero where denom == 0.

    Mirrors reference ``safe_div`` (egnn_pytorch.py:13-16).
    """
    res = num / jnp.clip(den, min=eps)
    return jnp.where(den == 0, jnp.zeros((), dtype=res.dtype), res)


def fourier_encode_dist(
    x: jnp.ndarray, num_encodings: int = 4, include_self: bool = True
) -> jnp.ndarray:
    """Fourier-feature encoding of a scalar distance channel.

    ``x`` of shape (...,) -> (..., 2*num_encodings + include_self):
    scales ``2**arange(K)``, emits ``[sin(x/s), cos(x/s), x]``.
    Mirrors reference ``fourier_encode_dist`` (egnn_pytorch.py:34-41).
    """
    x = x[..., None]
    scales = 2 ** jnp.arange(num_encodings, dtype=x.dtype)
    xs = x / scales
    out = jnp.concatenate([jnp.sin(xs), jnp.cos(xs)], axis=-1)
    if include_self:
        out = jnp.concatenate([out, x], axis=-1)
    return out


def batched_index_select(values: jnp.ndarray, indices: jnp.ndarray, axis: int = 1) -> jnp.ndarray:
    """Gather ``values`` along ``axis`` with a batched index tensor.

    Matches reference ``batched_index_select`` (egnn_pytorch.py:18-32): ``indices``
    has the batch dims of ``values[:axis]`` plus arbitrary extra dims; the result
    keeps ``values``' trailing dims. E.g. values (b, n, d), indices (b, i, k),
    axis=1 -> (b, i, k, d) where out[b,i,k] = values[b, indices[b,i,k]].
    """
    value_dims = values.shape[axis + 1:]
    n_extra = indices.ndim - axis  # index dims replacing the selected axis
    # Expand values with singleton dims so that take_along_axis broadcasts.
    v = values
    for _ in range(n_extra - 1):
        v = jnp.expand_dims(v, axis)
    idx = indices.reshape(indices.shape + (1,) * len(value_dims))
    return jnp.take_along_axis(v, idx, axis=axis + n_extra - 1)


def gather_bool(mask: jnp.ndarray, indices: jnp.ndarray) -> jnp.ndarray:
    """Boolean gather via a float gather + compare.

    TPU profile fact: gathering pred (1-byte) tensors lowers to a ~66 us
    "custom fusion" at (1024 -> 8192) sizes, while the same gather in f32 is
    ~13 us. Equivalent semantics (mask values are exactly 0/1)."""
    g = batched_index_select(mask.astype(jnp.float32), indices, axis=1)
    return g > 0.5


@jax.custom_vjp
def gather_nodes(values: jnp.ndarray, indices: jnp.ndarray) -> jnp.ndarray:
    """Neighbor gather (b, n, d) x (b, n, k) -> (b, n, k, d) whose BACKWARD
    routes through ops/segment.py's dispatching segment-sum instead of XLA's
    scatter-add (the scatter transpose measured ~56 us per 8192x32 on v5e;
    the one-hot MXU kernel halves it). Forward is a plain fast gather."""
    return batched_index_select(values, indices, axis=1)


def _gather_nodes_fwd(values, indices):
    return gather_nodes(values, indices), (indices, values.shape)


def _gather_nodes_bwd(res, g):
    from .segment import batched_segment_sum

    indices, vshape = res
    b, n, d = vshape
    dv = batched_segment_sum(
        g.reshape(b, -1, d), indices.reshape(b, -1), n)
    return dv.astype(g.dtype), None


gather_nodes.defvjp(_gather_nodes_fwd, _gather_nodes_bwd)


@jax.custom_vjp
def gather_rows(values: jnp.ndarray, indices: jnp.ndarray) -> jnp.ndarray:
    """Row gather (n, d) x (e,) -> (e, d) for the COO path, with the backward
    routed through ops/segment.py's dispatching segment-sum instead of XLA's
    scatter-add (same rationale as gather_nodes)."""
    return values[indices]


def _gather_rows_fwd(values, indices):
    return values[indices], (indices, values.shape[0])


def _gather_rows_bwd(res, g):
    from .segment import segment_sum

    indices, n = res
    return segment_sum(g, indices, n).astype(g.dtype), None


gather_rows.defvjp(_gather_rows_fwd, _gather_rows_bwd)


def gather_rows_blocked(
    values: jnp.ndarray,
    indices: jnp.ndarray,
    num_blocks: int,
    rows_per_block: int,
) -> jnp.ndarray:
    """Row gather for BLOCK-LOCAL index sets: indices in the g-th block of
    edge rows (positions [g*e_b, (g+1)*e_b)) must reference value rows
    [g*r_b, (g+1)*r_b) — the layout of any batched graph set with uniform
    graph size (PyG-style batching never crosses graphs). Out-of-block
    indices gather ZEROS (callers must edge-mask padding, as they already
    do for every masked builder layout).

    Why not ``gather_rows``: XLA row gathers and their scatter-add
    transposes are INDEX-bound (~46.5 us fwd+bwd at E=8192, 67 ch on v5e).
    With block locality the gather is a batched one-hot matmul on the MXU
    ((g, e_b, r_b) @ (g, r_b, c)); f32 HIGHEST precision makes the
    selection exact (one nonzero term per output row), and the backward is
    the transposed einsum — a dense per-block reduction instead of a
    scatter. Exact gradient accumulation order differs from scatter-add
    (tolerance-level, same class as the one-hot segment kernel).
    """
    n, c = values.shape
    assert n == num_blocks * rows_per_block, (n, num_blocks, rows_per_block)
    e = indices.shape[0]
    assert e % num_blocks == 0, (e, num_blocks)
    e_b = e // num_blocks
    local = indices.reshape(num_blocks, e_b) - (
        jnp.arange(num_blocks, dtype=indices.dtype) * rows_per_block
    )[:, None]
    onehot = (
        local[..., None] == jnp.arange(rows_per_block, dtype=indices.dtype)
    ).astype(values.dtype)
    out = jnp.einsum(
        "gen,gnc->gec",
        onehot,
        values.reshape(num_blocks, rows_per_block, c),
        precision=jax.lax.Precision.HIGHEST,
    )
    return out.reshape(e, c)


def coors_norm(
    coors: jnp.ndarray, scale: jnp.ndarray, eps: float = 1e-8
) -> jnp.ndarray:
    """Normalize relative coordinates to unit length, rescale by learned scalar.

    Mirrors reference ``CoorsNorm`` (egnn_pytorch.py:67-77): L2 norm over the last
    axis, clamped to ``eps``; ``scale`` is a learned (1,)-shaped parameter.

    The clamp is applied *inside* the sqrt (max(sqrt(s), eps) == sqrt(max(s, eps^2)),
    so the forward is identical) because jnp.linalg.norm has a NaN gradient at 0
    — and zero vectors always occur: kNN selects each node's self-pair (distance
    0, egnn_pytorch.py:258). torch defines a zero subgradient there; this
    formulation gives the same zero gradient under JAX autodiff.
    """
    sum_sq = jnp.sum(coors**2, axis=-1, keepdims=True)
    norm = jnp.sqrt(jnp.clip(sum_sq, min=eps * eps))
    return coors / norm * scale


def layer_norm(
    x: jnp.ndarray,
    gamma: Optional[jnp.ndarray],
    beta: Optional[jnp.ndarray],
    eps: float = 1e-5,
) -> jnp.ndarray:
    """torch.nn.LayerNorm semantics over the last axis (biased variance)."""
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    out = (x - mean) * jax.lax.rsqrt(var + eps)
    if gamma is not None:
        out = out * gamma
    if beta is not None:
        out = out + beta
    return out


def embed_tokens(x: jnp.ndarray, dims, tables) -> jnp.ndarray:
    """Replace trailing integer columns of ``x`` with embedding lookups.

    Mirrors reference ``embedd_token`` (egnn_pytorch.py:43-52): the last
    ``len(dims)`` columns are interpreted as integer token ids; each column i is
    replaced (left to right) by ``tables[i][token]`` concatenated to the right.
    ``tables`` are (num_embeddings, embedding_dim) arrays.
    """
    if not dims:
        return x
    stop_concat = -len(dims)
    to_embed = x[:, stop_concat:].astype(jnp.int32)
    for i, table in enumerate(tables):
        x = jnp.concatenate([x[:, :stop_concat], table[to_embed[:, i]]], axis=-1)
        stop_concat = x.shape[-1]
    return x
