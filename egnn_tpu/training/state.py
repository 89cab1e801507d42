"""Training state and step builders.

The reference's training loop (denoise_sparse.py:45-78) is a bare torch loop:
Adam(1e-3), grad-accumulation 16, MSE on masked coordinates. Here that becomes
a pure jitted train step over a parameter pytree: optax optimizer (including
optax.MultiSteps for grad accumulation), optional mesh sharding, donated state.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    @classmethod
    def create(cls, params, tx):
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=tx.init(params),
            tx=tx,
        )

    def apply_gradients(self, grads):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(
            step=self.step + 1,
            params=optax.apply_updates(self.params, updates),
            opt_state=new_opt,
        )


def masked_mse(pred: jnp.ndarray, target: jnp.ndarray, mask=None) -> jnp.ndarray:
    """MSE over valid entries (reference: F.mse_loss(denoised[masks], coords[masks]),
    denoise_sparse.py:72)."""
    err = (pred - target) ** 2
    if mask is None:
        return err.mean()
    m = mask[..., None].astype(err.dtype)
    # denominator from the (b, n) mask directly — no err-shaped buffer
    den = mask.sum().astype(err.dtype) * pred.shape[-1]
    return (err * m).sum() / jnp.clip(den, min=1.0)


def make_adam(learning_rate: float = 1e-3, grad_accum: int = 1,
              clip_norm: Optional[float] = None) -> optax.GradientTransformation:
    """Adam matching the example's optimizer, with optional grad accumulation
    (the reference accumulates 16 micro-steps) and global-norm clipping."""
    parts = []
    if clip_norm is not None:
        parts.append(optax.clip_by_global_norm(clip_norm))
    parts.append(optax.adam(learning_rate))
    tx = optax.chain(*parts)
    if grad_accum > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=grad_accum)
    return tx


class FusedAdamState(struct.PyTreeNode):
    count: jnp.ndarray
    m: jnp.ndarray      # first moment, ONE flat buffer over all params
    v: jnp.ndarray      # second moment, same layout


def make_fused_adam(learning_rate: float = 1e-3, b1: float = 0.9,
                    b2: float = 0.999, eps: float = 1e-8):
    """Adam with moments held as ONE flat buffer per order.

    The same Adam math as ``optax.adam`` (trajectory-pinned by
    tests/test_utils_subsystems.py::test_fused_adam_matches_optax), but the
    elementwise update runs as a handful of fused ops over a single
    contiguous buffer instead of ~8 ops x num_leaves tiny kernels — for
    EGNN-scale parameter trees (dozens of sub-KB leaves) the per-op launch
    overhead dominates the update, and XLA cannot fuse across leaves.
    Drop-in optax GradientTransformation; the flat<->tree round trip
    (ravel_pytree) is pure layout movement XLA folds into the fusion.
    """
    import optax as _optax
    from jax.flatten_util import ravel_pytree

    def init(params):
        flat, _ = ravel_pytree(params)
        return FusedAdamState(
            count=jnp.zeros((), jnp.int32),
            m=jnp.zeros_like(flat), v=jnp.zeros_like(flat))

    def update(grads, state, params=None):
        g, unravel = ravel_pytree(grads)
        count = state.count + 1
        m = b1 * state.m + (1.0 - b1) * g
        v = b2 * state.v + (1.0 - b2) * g * g
        c = count.astype(g.dtype)
        mhat = m / (1.0 - jnp.asarray(b1, g.dtype) ** c)
        vhat = v / (1.0 - jnp.asarray(b2, g.dtype) ** c)
        upd = (-learning_rate) * mhat / (jnp.sqrt(vhat) + eps)
        return unravel(upd), FusedAdamState(count=count, m=m, v=v)

    return _optax.GradientTransformation(init, update)


def make_denoise_train_step(
    net,
    loss_fn: Callable = masked_mse,
    donate: bool = True,
) -> Callable:
    """Jitted denoising train step for the dense network: predict clean coords
    from noised coords; loss on masked coordinates (the reference's end-to-end
    workload, denoise_sparse.py:68-74)."""

    def step(state: TrainState, tokens, noised_coors, target_coors, adj_mat, mask):
        def loss_of(params):
            feats, denoised = net.apply(
                {"params": params}, tokens, noised_coors, adj_mat=adj_mat, mask=mask
            )
            return loss_fn(denoised, target_coors, mask)

        loss, grads = jax.value_and_grad(loss_of)(state.params)
        return state.apply_gradients(grads), loss

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_sharded_denoise_train_step(
    net,
    mesh: Mesh,
    loss_fn: Callable = masked_mse,
) -> Callable:
    """Mesh-sharded train step: batch on ``data``, node dim on ``graph``,
    parameters replicated. XLA/GSPMD inserts the collectives (all-gather of the
    j-dimension tensors over ICI for the pairwise ops, psum of gradients over
    ``data``) — the scaling-book recipe: annotate shardings, let XLA place
    collectives (SURVEY.md §5.8)."""
    repl = NamedSharding(mesh, P())
    dnode = NamedSharding(mesh, P("data", "graph"))
    dnode_c = NamedSharding(mesh, P("data", "graph", None))

    def step(state: TrainState, tokens, noised_coors, target_coors, adj_mat, mask):
        def loss_of(params):
            feats, denoised = net.apply(
                {"params": params}, tokens, noised_coors, adj_mat=adj_mat, mask=mask
            )
            return loss_fn(denoised, target_coors, mask)

        loss, grads = jax.value_and_grad(loss_of)(state.params)
        return state.apply_gradients(grads), loss

    return jax.jit(
        step,
        in_shardings=(repl, dnode, dnode_c, dnode_c, repl, dnode),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )


def make_ring_denoise_train_step(
    net,
    mesh: Mesh,
    data_axis: str = "data",
    graph_axis: str = "graph",
) -> Callable:
    """Explicit shard_map train step for the ring-parallel dense path.

    Unlike make_sharded_denoise_train_step (GSPMD annotate-and-let-XLA), this
    places every collective by hand: the batch is sharded over ``data_axis``,
    the node dimension over ``graph_axis``; inside each shard the EGNN layers
    (built with ``ring_axis=graph_axis``) rotate j-shards around the ICI ring
    via ppermute (parallel/ring.py), the masked-MSE loss is psum-reduced, and
    gradients are psum'd over both axes. Requirements: the network's layers
    use the all-pairs ring path (no kNN/adjacency), no positional embedding
    (position ids would be shard-local), no global attention.
    """
    axes = (data_axis, graph_axis)

    def sharded_value_grad(params, tokens, noised, clean, mask):
        # Differentiate the LOCAL loss contribution and psum values+grads
        # afterwards. (Differentiating a psum'd loss instead would re-psum
        # the replicated cotangent under check_vma=False and scale gradients
        # by the axis size.) The global denominator carries no parameter
        # dependence, so psum'ing it inside is safe.
        def loss_local(p):
            feats, denoised = net.apply(
                {"params": p}, tokens, noised, mask=mask
            )
            err = (denoised - clean) ** 2 * mask[..., None].astype(denoised.dtype)
            den = jax.lax.psum(
                mask.sum().astype(err.dtype) * denoised.shape[-1], axes
            )
            return err.sum() / jnp.maximum(den, 1.0)

        loss_l, grads_l = jax.value_and_grad(loss_local)(params)
        loss = jax.lax.psum(loss_l, axes)
        grads = jax.lax.psum(grads_l, axes)
        return loss, grads

    P_ = P
    sharded_value_grad = jax.shard_map(
        sharded_value_grad,
        mesh=mesh,
        in_specs=(
            P_(),                                  # params replicated
            P_(data_axis, graph_axis),             # tokens (b, n)
            P_(data_axis, graph_axis, None),       # noised coors
            P_(data_axis, graph_axis, None),       # clean coors
            P_(data_axis, graph_axis),             # mask
        ),
        out_specs=(P_(), P_()),
        check_vma=False,
    )

    def step(state: TrainState, tokens, noised, clean, mask):
        loss, grads = sharded_value_grad(state.params, tokens, noised, clean, mask)
        return state.apply_gradients(grads), loss

    return jax.jit(step, donate_argnums=(0,))


def make_partitioned_sparse_train_step(
    net,
    mesh: Mesh,
    graph_axis: str = "graph",
    num_graphs: int = 1,
) -> Callable:
    """Explicit shard_map train step for the edge-partitioned SPARSE path.

    The multi-chip story for the COO/molecule workload (SURVEY.md §2c "graph
    partition"): nodes block-sharded over ``graph_axis``; each shard owns the
    edges whose RECEIVER it owns, in the layout of
    parallel/sparse_partition.py:partition_edges (receiver ids local, sender
    ids global, static per-shard capacity + mask). ``net`` must be an
    EGNNSparseNetwork built with ``shard_axis=graph_axis`` — inside, sender
    features resolve against one all-gather of the node tensor over ICI per
    layer, and graph-LayerNorm statistics psum to global values.

    The loss is coordinate denoising (masked MSE of the output coordinate
    block vs ``clean_coors``), psum-reduced over the axis; gradients psum so
    the replicated Adam update is identical on every shard.

    Step signature:
      step(state, x, senders, receivers, edge_mask, edge_attr, batch_ids,
           clean_coors, node_mask) -> (state, loss)
    with every array except ``state`` sharded ``P(graph_axis)`` on its
    leading (node or edge-slot) dimension.
    """

    def sharded_value_grad(params, x, snd, rcv, emsk, ea, bi, clean, nmsk):
        # Same psum-after-grad discipline as the ring step: differentiate the
        # local contribution, then psum value + grads (see the note there).
        def loss_local(p):
            out = net.apply(
                {"params": p}, x, jnp.stack([snd, rcv]), edge_attr=ea,
                batch=bi, edge_mask=emsk, num_graphs=num_graphs,
                node_mask=nmsk,
            )
            pos_dim = clean.shape[-1]
            err = (out[:, :pos_dim] - clean) ** 2
            err = err * nmsk[:, None].astype(err.dtype)
            den = jax.lax.psum(
                nmsk.sum().astype(err.dtype) * pos_dim, graph_axis
            )
            return err.sum() / jnp.maximum(den, 1.0)

        loss_l, grads_l = jax.value_and_grad(loss_local)(params)
        return (
            jax.lax.psum(loss_l, graph_axis),
            jax.lax.psum(grads_l, graph_axis),
        )

    sharded_value_grad = jax.shard_map(
        sharded_value_grad,
        mesh=mesh,
        in_specs=(
            P(),             # params replicated
            P(graph_axis),   # x (N, pos+feat) node-sharded
            P(graph_axis),   # senders (global ids, per-shard slots)
            P(graph_axis),   # receivers (local ids)
            P(graph_axis),   # edge mask
            P(graph_axis),   # edge_attr
            P(graph_axis),   # batch ids
            P(graph_axis),   # clean coords
            P(graph_axis),   # node mask
        ),
        out_specs=(P(), P()),
        check_vma=False,
    )

    def step(state: TrainState, x, snd, rcv, emsk, ea, bi, clean, nmsk):
        loss, grads = sharded_value_grad(
            state.params, x, snd, rcv, emsk, ea, bi, clean, nmsk
        )
        return state.apply_gradients(grads), loss

    return jax.jit(step, donate_argnums=(0,))
