"""GPipe-style pipeline parallelism for homogeneous EGNN depth stacks.

The reference has no parallelism of any kind (SURVEY.md §2c); this module
closes the one strategy previously documented as absent (docs/SCALING.md).
It is the right axis when a model is DEEP (depth ≳ 4·stages) and its
per-layer state is small — exactly the regime where replicating all layers'
params/optimizer state per chip wastes HBM: each of S pipeline stages holds
only depth/S layers' params, and M microbatches stream through the ring.

TPU-native design (the scaling-book pipeline recipe, not a port of any
torch PP framework):
- runs inside ``shard_map`` over a ``pipe`` mesh axis; stage parameters are
  SHARDED on that axis (stacked (S, L_local, ...) pytree, spec P("pipe")),
  activations hop stage→stage via ``lax.ppermute`` over ICI;
- the schedule is a single ``lax.scan`` over T = M + S - 1 ticks (fill +
  drain); at tick t, stage d computes microbatch m = t - d (bubble ticks
  compute garbage that is masked at collection — branch-free, so the
  program is identical on every device, the shard_map/SPMD requirement);
- per-microbatch aux inputs (mask) are replicated and indexed by the
  stage's current microbatch id; kNN selection happens inside the layers
  from the in-flight coordinates, so nothing else travels;
- collection: the last stage's outputs for ticks ≥ S-1 are psum-broadcast
  (masked to the last stage) so every device returns the full (M, ...)
  result — one psum, after which the caller's loss is replicated.

Autodiff goes straight through (ppermute's transpose is the reverse
permute; the scan transposes into the reverse schedule), so
``jax.value_and_grad`` of a pipelined loss yields per-stage param grads
sharded exactly like the params — each stage updates only its own slice
(tested for parity against the sequential stack in tests/test_pipeline.py).

Bubble fraction is the usual (S-1)/(M+S-1); pick M ≥ 4·S. The dense EGNN
layer is cheap at reference sizes, so this is a capability for deep/wide
custom stacks — see docs/SCALING.md for when to prefer the graph/data axes.
"""
from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp


def stack_layer_params(layer, key, feats, coors, depth: int, *,
                       mask=None, adj_mat=None):
    """Initialize ``depth`` independent layer parameter sets, stacked on a
    leading axis: the pytree every pipeline entry point consumes. Reshape to
    (S, depth//S, ...) per-stage blocks with :func:`to_stages`."""
    keys = jax.random.split(key, depth)

    def one(k):
        return layer.init(k, feats, coors, mask=mask, adj_mat=adj_mat)["params"]

    return jax.vmap(one)(keys)


def to_stages(stacked, n_stages: int):
    """(depth, ...) stacked layer params -> (S, depth//S, ...) stage blocks."""
    def r(x):
        d = x.shape[0]
        assert d % n_stages == 0, f"depth {d} not divisible by {n_stages} stages"
        return x.reshape(n_stages, d // n_stages, *x.shape[1:])

    return jax.tree.map(r, stacked)


def pipeline_apply(
    layer,
    stage_params,            # (1, L_local, ...) pytree — THIS device's block
    feats_mb: jnp.ndarray,   # (M, mb, n, d) microbatched inputs (replicated)
    coors_mb: jnp.ndarray,   # (M, mb, n, c)
    mask_mb: Optional[jnp.ndarray] = None,   # (M, mb, n) bool
    adj_mat: Optional[jnp.ndarray] = None,   # (n, n) static, replicated
    *,
    axis_name: str = "pipe",
):
    """Run the pipelined stack. Must execute inside shard_map with
    ``stage_params`` sharded P(axis_name) on the leading stage axis and all
    other operands replicated. Returns (feats (M, mb, n, d), coors (M, mb,
    n, c)) — the full result, replicated (see module docstring)."""
    S = jax.lax.axis_size(axis_name)
    d_idx = jax.lax.axis_index(axis_name)
    M = feats_mb.shape[0]
    T = M + S - 1
    perm = [(s, s + 1) for s in range(S - 1)]   # stage d -> d+1 (no wrap)

    def stage_fn(f, c, m):
        def body(fc, p):
            fo, co = layer.apply({"params": p}, fc[0], fc[1],
                                 mask=m, adj_mat=adj_mat)
            return (fo, co), None
        (f, c), _ = jax.lax.scan(body, (f, c), jax.tree.map(lambda x: x[0], stage_params))
        return f, c

    def tick(carry, t):
        f_in, c_in = carry
        m_id = jnp.clip(t - d_idx, 0, M - 1)
        # stage 0 pulls a fresh microbatch; others consume the ppermuted
        # activation from the previous stage (bubble ticks recompute a
        # clamped microbatch — masked out at collection)
        f = jnp.where(d_idx == 0, feats_mb[jnp.clip(t, 0, M - 1)], f_in)
        c = jnp.where(d_idx == 0, coors_mb[jnp.clip(t, 0, M - 1)], c_in)
        m = mask_mb[m_id] if mask_mb is not None else None
        fo, co = stage_fn(f, c, m)
        nxt = jax.tree.map(
            lambda x: jax.lax.ppermute(x, axis_name, perm), (fo, co))
        return nxt, (fo, co)

    init = (jnp.zeros_like(feats_mb[0]), jnp.zeros_like(coors_mb[0]))
    _, (f_ticks, c_ticks) = jax.lax.scan(tick, init, jnp.arange(T))

    # last stage's ticks S-1 .. T-1 hold microbatches 0 .. M-1
    is_last = (d_idx == S - 1).astype(f_ticks.dtype)
    f_out = jax.lax.psum(f_ticks[S - 1:] * is_last, axis_name)
    c_out = jax.lax.psum(c_ticks[S - 1:] * is_last.astype(c_ticks.dtype),
                         axis_name)
    return f_out, c_out


def make_pipelined_apply(
    layer,
    mesh,
    n_microbatches: int,
    *,
    axis_name: str = "pipe",
) -> Callable:
    """Build a jitted pipelined forward over ``mesh``'s ``axis_name`` axis.

    Returns ``apply(stage_params, feats, coors, mask=None, adj_mat=None)``
    where ``stage_params`` is the (S, L, ...) pytree from :func:`to_stages`
    (sharded P(axis_name) by GSPMD via the shard_map in_spec) and
    ``feats``/``coors`` are full batches (b, n, ·) with b divisible by
    ``n_microbatches``; output matches the sequential depth-stack apply.
    """
    from jax.sharding import PartitionSpec as P

    M = n_microbatches

    def apply(stage_params, feats, coors, mask=None, adj_mat=None):
        b = feats.shape[0]
        assert b % M == 0, f"batch {b} not divisible by {M} microbatches"
        mb = b // M
        f_mb = feats.reshape(M, mb, *feats.shape[1:])
        c_mb = coors.reshape(M, mb, *coors.shape[1:])
        m_mb = mask.reshape(M, mb, *mask.shape[1:]) if mask is not None else None

        def run(sp, f, c, m, a):
            return pipeline_apply(layer, sp, f, c, m, a, axis_name=axis_name)

        fo, co = jax.shard_map(
            run, mesh=mesh,
            in_specs=(P(axis_name), P(), P(), P(), P()),
            out_specs=(P(), P()),
            check_vma=False,
        )(stage_params, f_mb, c_mb, m_mb, adj_mat)
        return (fo.reshape(b, *feats.shape[1:]),
                co.reshape(b, *coors.shape[1:]))

    return jax.jit(apply)
