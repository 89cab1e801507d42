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
- collection (round-5 restructure): the last stage deposits each drained
  microbatch into an (M, ...) in-scan accumulator — collection memory is
  exactly the result, not the old (T = M+S-1, ...) full tick stack on
  every device — and one psum replicates it. For TRAINING, prefer
  ``pipeline_loss``/``make_pipelined_loss``: the last stage folds each
  microbatch's loss into a scalar at its drain tick, so collection is
  O(1) memory and ONE scalar psum instead of an (M, mb, n, ·) broadcast
  — the profile that matters in PP's actual regime (deep stacks).

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
        f_in, c_in, f_acc, c_acc = carry
        m_id = jnp.clip(t - d_idx, 0, M - 1)
        # stage 0 pulls a fresh microbatch; others consume the ppermuted
        # activation from the previous stage (bubble ticks recompute a
        # clamped microbatch — masked out at collection)
        f = jnp.where(d_idx == 0, feats_mb[jnp.clip(t, 0, M - 1)], f_in)
        c = jnp.where(d_idx == 0, coors_mb[jnp.clip(t, 0, M - 1)], c_in)
        m = mask_mb[m_id] if mask_mb is not None else None
        fo, co = stage_fn(f, c, m)
        # collection: the LAST stage deposits microbatch t-(S-1) into the
        # (M, ...) accumulator (round-4 verdict: the old version stacked
        # ALL T = M+S-1 tick outputs on EVERY stage — (S-1) extra
        # microbatch slots of dead activation memory per device, all of it
        # then pushed through the psum; the accumulator keeps collection
        # memory at exactly the (M, ...) result and non-last stages'
        # accumulators stay zero). Branch-free: non-write ticks rewrite
        # the slot with itself (SPMD requires the identical program).
        m_out = t - (S - 1)
        write = (d_idx == S - 1) & (m_out >= 0)
        mo = jnp.clip(m_out, 0, M - 1)
        f_slot = jnp.where(write, fo, jax.lax.dynamic_index_in_dim(
            f_acc, mo, 0, keepdims=False))
        c_slot = jnp.where(write, co, jax.lax.dynamic_index_in_dim(
            c_acc, mo, 0, keepdims=False))
        f_acc = jax.lax.dynamic_update_index_in_dim(f_acc, f_slot, mo, 0)
        c_acc = jax.lax.dynamic_update_index_in_dim(c_acc, c_slot, mo, 0)
        nxt = jax.tree.map(
            lambda x: jax.lax.ppermute(x, axis_name, perm), (fo, co))
        return (nxt[0], nxt[1], f_acc, c_acc), None

    init = (jnp.zeros_like(feats_mb[0]), jnp.zeros_like(coors_mb[0]),
            jnp.zeros_like(feats_mb), jnp.zeros_like(coors_mb))
    (_, _, f_acc, c_acc), _ = jax.lax.scan(tick, init, jnp.arange(T))

    # only the last stage's accumulator is nonzero: one psum replicates it
    f_out = jax.lax.psum(f_acc, axis_name)
    c_out = jax.lax.psum(c_acc, axis_name)
    return f_out, c_out


def pipeline_loss(
    layer,
    stage_params,            # (1, L_local, ...) pytree — THIS device's block
    feats_mb: jnp.ndarray,   # (M, mb, n, d)
    coors_mb: jnp.ndarray,   # (M, mb, n, c)
    loss_fn: Callable,       # (feats, coors, target, mask|None) -> scalar MEAN
    target_mb: jnp.ndarray,  # (M, mb, n, c) per-microbatch targets
    mask_mb: Optional[jnp.ndarray] = None,
    adj_mat: Optional[jnp.ndarray] = None,
    *,
    axis_name: str = "pipe",
):
    """Streaming-loss pipeline: the last stage folds each microbatch's loss
    into a SCALAR accumulator at the tick it drains, so collection costs
    O(1) memory and ONE scalar psum — instead of materializing and
    broadcasting the full (M, mb, n, ·) output stack. This is the profile
    that matters in PP's actual regime (deep stacks, where the (M, ...)
    output broadcast of :func:`pipeline_apply` is pure training overhead).
    Returns the replicated mean-over-microbatches loss; autodiff yields
    per-stage param grads sharded like the params."""
    S = jax.lax.axis_size(axis_name)
    d_idx = jax.lax.axis_index(axis_name)
    M = feats_mb.shape[0]
    T = M + S - 1
    perm = [(s, s + 1) for s in range(S - 1)]

    def stage_fn(f, c, m):
        def body(fc, p):
            fo, co = layer.apply({"params": p}, fc[0], fc[1],
                                 mask=m, adj_mat=adj_mat)
            return (fo, co), None
        (f, c), _ = jax.lax.scan(
            body, (f, c), jax.tree.map(lambda x: x[0], stage_params))
        return f, c

    def tick(carry, t):
        f_in, c_in, acc = carry
        m_id = jnp.clip(t - d_idx, 0, M - 1)
        f = jnp.where(d_idx == 0, feats_mb[jnp.clip(t, 0, M - 1)], f_in)
        c = jnp.where(d_idx == 0, coors_mb[jnp.clip(t, 0, M - 1)], c_in)
        m = mask_mb[m_id] if mask_mb is not None else None
        fo, co = stage_fn(f, c, m)
        m_out = t - (S - 1)
        write = (d_idx == S - 1) & (m_out >= 0)
        mo = jnp.clip(m_out, 0, M - 1)
        mb_loss = loss_fn(fo, co, target_mb[mo],
                          mask_mb[mo] if mask_mb is not None else None)
        acc = acc + jnp.where(write, mb_loss, jnp.zeros_like(mb_loss))
        nxt = jax.tree.map(
            lambda x: jax.lax.ppermute(x, axis_name, perm), (fo, co))
        return (nxt[0], nxt[1], acc), None

    init = (jnp.zeros_like(feats_mb[0]), jnp.zeros_like(coors_mb[0]),
            jnp.zeros((), feats_mb.dtype))
    (_, _, acc), _ = jax.lax.scan(tick, init, jnp.arange(T))
    return jax.lax.psum(acc, axis_name) / M


def make_pipelined_loss(
    layer,
    mesh,
    n_microbatches: int,
    loss_fn: Callable,
    *,
    axis_name: str = "pipe",
) -> Callable:
    """Jitted streaming-loss pipeline over ``mesh``: returns
    ``loss(stage_params, feats, coors, target, mask=None, adj_mat=None)``
    — the mean per-microbatch ``loss_fn`` (same scalar the sequential
    stack's batch-mean loss gives when ``loss_fn`` is a mean and the batch
    splits evenly). Differentiate it directly for per-stage sharded
    gradients."""
    from jax.sharding import PartitionSpec as P

    M = n_microbatches

    def apply(stage_params, feats, coors, target, mask=None, adj_mat=None):
        b = feats.shape[0]
        assert b % M == 0, f"batch {b} not divisible by {M} microbatches"
        mb = b // M
        f_mb = feats.reshape(M, mb, *feats.shape[1:])
        c_mb = coors.reshape(M, mb, *coors.shape[1:])
        t_mb = target.reshape(M, mb, *target.shape[1:])
        m_mb = (mask.reshape(M, mb, *mask.shape[1:])
                if mask is not None else None)

        def run(sp, f, c, tt, m, a):
            return pipeline_loss(layer, sp, f, c, loss_fn, tt, m, a,
                                 axis_name=axis_name)

        return jax.shard_map(
            run, mesh=mesh,
            in_specs=(P(axis_name), P(), P(), P(), P(), P()),
            out_specs=P(),
            check_vma=False,
        )(stage_params, f_mb, c_mb, t_mb, m_mb, adj_mat)

    return jax.jit(apply)


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
