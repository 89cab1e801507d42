"""Dense-path E(n)-equivariant GNN: the EGNN layer and EGNN_Network stack.

TPU-native re-implementation of the reference's dense path
(egnn_pytorch.py:148-454). Same math and option surface; different compute
layout, designed for the MXU/XLA:

- The pairwise edge-MLP's first layer is *factorized*: with input
  ``[f_i, f_j, dist_feats, edges]`` and weight rows ``[Wi; Wj; Wd; We]``,
  ``h1_ij = (f @ Wi)_i + (f @ Wj)_j + dist_ij @ Wd + e_ij @ We + b1``.
  The two big (n, dim) @ (dim, hidden) matmuls run once per *node* instead of
  once per *pair* — O(n d h) instead of O(n^2 d h) — and only the cheap
  rank-(2F+1) and edge-feature terms remain pairwise. Algebraically identical
  to the reference's concat+matmul (egnn_pytorch.py:282-287).
- Neighbor selection uses static-k ``lax.top_k`` (TPU needs static shapes);
  see egnn_tpu/ops/neighbors.py for the exact ranking-rule parity.
- No in-place ops; masks are ``jnp.where``; everything jits to one XLA program.

Faithfully reproduced quirks (documented, deliberate):
- ``valid_radius`` only takes effect when a ``mask`` is passed (the reference
  combines ``nbhd_mask`` into the pair mask only under ``exists(mask)``,
  egnn_pytorch.py:292-300).
- With ``only_sparse_neighbors``, k = max row degree *including* the self slot,
  so the max-degree node drops one neighbor (egnn_pytorch.py:249-258).
"""
from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import neighbors as nb
from ..ops.core import (
    batched_index_select,
    coors_norm,
    fourier_encode_dist,
    gather_bool,
    gather_nodes,
    layer_norm,
    safe_div,
)
from . import init as inits
from .attention import GlobalLinearAttention


def _silu(x):
    return x * jax.nn.sigmoid(x)


class EGNN(nn.Module):
    """One dense E(n)-equivariant message-passing layer.

    Option surface mirrors the reference EGNN (egnn_pytorch.py:148-222) —
    every kwarg keeps its reference name and default.
    """

    dim: int
    edge_dim: int = 0
    m_dim: int = 16
    fourier_features: int = 0
    num_nearest_neighbors: int = 0
    dropout: float = 0.0
    init_eps: float = 1e-3
    norm_feats: bool = False
    norm_coors: bool = False
    norm_coors_scale_init: float = 1e-2
    update_feats: bool = True
    update_coors: bool = True
    only_sparse_neighbors: bool = False
    valid_radius: float = float("inf")
    m_pool_method: str = "sum"
    soft_edges: bool = False
    coor_weights_clamp_value: Optional[float] = None
    # TPU-native extras (absent in the reference):
    # stream_pairwise: None = auto (stream the all-pairs path when n >= 1024),
    # True/False = force. Streaming computes pairwise messages as a j-chunked
    # scan with rematerialization — O(n·chunk) memory instead of O(n^2)
    # (ops/pairwise_stream.py). Only applies to the no-kNN, no-dense-edges
    # path; dropout>0 streams too (per-chunk RNG via fold_in).
    stream_pairwise: Optional[bool] = None
    pairwise_chunk: Optional[int] = None
    # ring_axis: mesh axis name for ring-rotated node-sharded all-pairs
    # compute (parallel/ring.py). The module must then be applied inside
    # shard_map with the node dimension sharded on that axis and params
    # replicated; each device computes its i-shard while j-shards rotate
    # around the ICI ring via ppermute.
    ring_axis: Optional[str] = None
    # fused_knn: opt-in Pallas fused pair pipeline for the kNN path
    # (ops/pallas/knn_layer.py). Off by default: XLA's gather pipeline
    # measured faster at typical sizes; see the kernel's docstring.
    fused_knn: bool = False
    # fused_pairs: opt-in PRE-GATHERED fused pair pipeline
    # (ops/pallas/pair_messages.py): the combined selection+payload gather
    # feeds the kernel directly; aggregates over the (possibly kc-wide)
    # gathered slots under the pair mask, replacing the XLA
    # (b, n, k, hidden) pipeline. Forcing True off-TPU runs interpret mode
    # (slow, parity tests). Falls back silently when unsupported (dense
    # edges, dropout active, partial updates, k not paddable into VMEM).
    fused_pairs: bool = False
    # compute_dtype: mixed-precision policy for the MESSAGE path (edge MLP,
    # gate, coordinate-weight MLP, node MLP) — typically jnp.bfloat16 on TPU.
    # Parameters stay f32; GEOMETRY (rel_coors, distances, CoorsNorm, the
    # coordinate update itself) always runs f32 so equivariance quality is
    # unchanged. Applies to the materialized kNN/all-pairs branch AND the
    # streamed/ring paths (cross-chunk accumulators stay f32 there).
    compute_dtype: Any = None
    # tp_hidden_multiple: round the edge-MLP hidden width (reference shape
    # 2*(2*dim + 2F + 1 + e), CONGRUENT TO 2 MOD 4 for even dim and F=e=0 —
    # egnn_pytorch.py:175,179) up to this multiple so tensor parallelism can
    # shard it (parallel/tp.py needs hidden % model_axis == 0; use
    # 2*model_axis to keep the post-pad width axis-divisible). The padded
    # hidden units are EXACTLY inert: zero first-layer columns/bias produce
    # silu(0)=0 activations, zero second-layer rows consume them, and both
    # pads receive identically-zero gradients (silu'(0) gated by zero W2
    # rows), so math — and training trajectories — match the reference
    # unpadded layer bit-for-bit in expectation. None = reference shapes.
    tp_hidden_multiple: Optional[int] = None

    def _linear(self, name, d_in, d_out):
        w = self.param(f"{name}_w", inits.normal_init(self.init_eps), (d_in, d_out))
        b = self.param(f"{name}_b", inits.torch_linear_bias_init(d_in), (d_out,))
        return w, b

    @nn.compact
    def __call__(
        self,
        feats: jnp.ndarray,          # (b, n, dim)
        coors: jnp.ndarray,          # (b, n, c) — any spatial dim c
        edges: Optional[jnp.ndarray] = None,   # (b, n, n, edge_dim)
        mask: Optional[jnp.ndarray] = None,    # (b, n) bool
        adj_mat: Optional[jnp.ndarray] = None, # (n, n) or (b, n, n) bool
        deterministic: bool = True,
    ):
        assert self.m_pool_method in {"sum", "mean"}, "pool method must be either sum or mean"
        assert self.update_feats or self.update_coors, (
            "you must update either features, coordinates, or both"
        )
        b, n, d = feats.shape
        assert d == self.dim, f"feats dim {d} != configured dim {self.dim}"
        fourier = self.fourier_features
        dist_dim = 2 * fourier + 1
        edge_dim = self.edge_dim
        ein = dist_dim + 2 * d + edge_dim
        hidden = ein * 2
        if self.tp_hidden_multiple:
            tm = self.tp_hidden_multiple
            hidden_pad = -(-hidden // tm) * tm
        else:
            hidden_pad = hidden

        num_nearest = self.num_nearest_neighbors
        valid_radius = self.valid_radius
        use_nearest = num_nearest > 0 or self.only_sparse_neighbors

        # ---- parameters (flat, named for easy torch-weight injection) ----
        if hidden_pad != hidden:
            # zero-padded inert hidden units (see tp_hidden_multiple)
            edge_w1 = self.param(
                "edge_mlp_0_w",
                inits.zero_pad_axis(inits.normal_init(self.init_eps), 1, hidden),
                (ein, hidden_pad))
            edge_b1 = self.param(
                "edge_mlp_0_b",
                inits.zero_pad_axis(inits.torch_linear_bias_init(ein), 0, hidden),
                (hidden_pad,))
            edge_w2 = self.param(
                "edge_mlp_1_w",
                inits.zero_pad_axis(inits.normal_init(self.init_eps), 0, hidden),
                (hidden_pad, self.m_dim))
            edge_b2 = self.param(
                "edge_mlp_1_b", inits.torch_linear_bias_init(hidden), (self.m_dim,))
        else:
            edge_w1, edge_b1 = self._linear("edge_mlp_0", ein, hidden)
            edge_w2, edge_b2 = self._linear("edge_mlp_1", hidden, self.m_dim)
        if self.soft_edges:
            gate_w, gate_b = self._linear("edge_gate", self.m_dim, 1)
        if self.norm_feats:
            nn_gamma = self.param("node_norm_gamma", inits.ones_init, (d,))
            nn_beta = self.param("node_norm_beta", inits.zeros_init, (d,))
        if self.norm_coors:
            cn_scale = self.param(
                "coors_norm_scale", inits.constant_init(self.norm_coors_scale_init), (1,)
            )
        if self.update_feats:
            node_w1, node_b1 = self._linear("node_mlp_0", d + self.m_dim, d * 2)
            node_w2, node_b2 = self._linear("node_mlp_1", d * 2, d)
        if self.update_coors:
            coors_w1, coors_b1 = self._linear("coors_mlp_0", self.m_dim, self.m_dim * 4)
            coors_w2, coors_b2 = self._linear("coors_mlp_1", self.m_dim * 4, 1)
        drop = nn.Dropout(rate=self.dropout)

        def node_update(m_i, mp=lambda v: v):
            """Shared feature-update tail for all three compute paths
            (streamed / fused-kNN / materialized): LayerNorm? -> concat with
            the pooled message -> node MLP -> residual (egnn_pytorch.py:
            335-337). ``mp`` is the mixed-precision cast (identity on the
            f32-only streamed/fused paths)."""
            normed = layer_norm(feats, nn_gamma, nn_beta) if self.norm_feats else feats
            h = jnp.concatenate([mp(normed), m_i.astype(mp(normed).dtype)], axis=-1)
            h = _silu(drop(h @ mp(node_w1) + mp(node_b1), deterministic=deterministic))
            return (h @ mp(node_w2) + mp(node_b2)).astype(feats.dtype) + feats

        # Factorized first-layer weight blocks, concat order [f_i, f_j, dist, edges]
        # (egnn_pytorch.py:282-285).
        w_i = edge_w1[:d]
        w_j = edge_w1[d : 2 * d]
        w_d = edge_w1[2 * d : 2 * d + dist_dim]
        w_e = edge_w1[2 * d + dist_dim :]

        # mp: mixed-precision cast for the message path (no-op by default)
        mp = (
            (lambda x: x.astype(self.compute_dtype))
            if self.compute_dtype is not None
            else (lambda x: x)
        )
        dropout_active = self.dropout > 0.0 and not deterministic

        # ---- streamed all-pairs path (no (n, n) HBM intermediates) ----
        can_stream = not use_nearest and edges is None
        do_stream = self.ring_axis is not None or (
            self.stream_pairwise if self.stream_pairwise is not None else n >= 1024
        )
        assert self.ring_axis is None or (can_stream and not dropout_active), (
            "ring_axis requires the all-pairs streamed configuration: no kNN/"
            "only_sparse_neighbors, no dense edges, and dropout inactive — "
            "otherwise the layer would silently compute shard-local "
            "neighborhoods only"
        )
        if can_stream and do_stream:
            from ..ops.pairwise_stream import PairwiseParams, streamed_pairwise

            pp = PairwiseParams(
                w_d=w_d,
                edge_w2=edge_w2,
                edge_b2=edge_b2,
                gate_w=gate_w if self.soft_edges else None,
                gate_b=gate_b if self.soft_edges else None,
                coors_w1=coors_w1 if self.update_coors else None,
                coors_b1=coors_b1 if self.update_coors else None,
                coors_w2=coors_w2 if self.update_coors else None,
                coors_b2=coors_b2 if self.update_coors else None,
                cn_scale=cn_scale if self.norm_coors else None,
            )
            pair_opts = dict(
                fourier_features=fourier,
                update_coors=self.update_coors,
                update_feats=self.update_feats,
                soft_edges=self.soft_edges,
                norm_coors=self.norm_coors,
                coor_weights_clamp_value=self.coor_weights_clamp_value,
                compute_dtype=self.compute_dtype,
            )
            proj_i_s = mp(feats) @ mp(w_i) + mp(edge_b1)
            proj_j_s = mp(feats) @ mp(w_j)
            n_total = n
            if self.ring_axis is not None:
                from ..parallel.ring import ring_pairwise

                res = ring_pairwise(
                    coors, proj_i_s, proj_j_s, pp, mask=mask,
                    axis_name=self.ring_axis, **pair_opts,
                )
                # inside shard_map n is the local shard size
                n_total = n * jax.lax.axis_size(self.ring_axis)
            else:
                res = streamed_pairwise(
                    coors, proj_i_s, proj_j_s, pp, mask=mask,
                    chunk=self.pairwise_chunk,
                    dropout_rate=self.dropout if dropout_active else 0.0,
                    dropout_rng=(
                        self.make_rng("dropout") if dropout_active else None
                    ),
                    **pair_opts,
                )
            coors_out = coors + res.coors_delta if self.update_coors else coors
            if self.update_feats:
                if self.m_pool_method == "mean":
                    if mask is not None:
                        m_i = safe_div(res.m_i, res.pair_count[..., None])
                    else:
                        m_i = res.m_i / n_total
                else:
                    m_i = res.m_i
                node_out = node_update(m_i, mp)
            else:
                node_out = feats
            return node_out, coors_out

        # ---- pairwise geometry ----
        nbhd = None
        if use_nearest:
            if self.only_sparse_neighbors:
                assert adj_mat is not None, "only_sparse_neighbors requires adj_mat"
                # The reference UNCONDITIONALLY overrides k with the adjacency's
                # max row degree (egnn_pytorch.py:249), even when the user set
                # num_nearest_neighbors. Match that whenever the adjacency is
                # concrete; under jit (traced adjacency) a static k is required
                # on TPU, so fall back to the user-provided value.
                derived = nb.try_max_degree(adj_mat)
                if derived is not None:
                    num_nearest = derived
                elif num_nearest == 0:
                    raise ValueError(
                        "only_sparse_neighbors under jit needs a static k: "
                        "pass num_nearest_neighbors explicitly or a concrete "
                        "adjacency matrix"
                    )
                valid_radius = 0.0
            adj_b = None
            if adj_mat is not None:
                adj_b = adj_mat if adj_mat.ndim == 3 else jnp.broadcast_to(adj_mat, (b, n, n))
            def pool_kernel_messages(m_sum, pv):
                """Shared mean/sum pooling of the kernel paths' PRE-SUMMED
                messages. The no-mask mean divisor is the selected-slot
                count k (reference egnn_pytorch.py:330-333), which is also
                exactly the winner count in the wide kc-slot case."""
                if self.m_pool_method != "mean":
                    return m_sum
                if mask is not None:
                    cnt = pv.sum(axis=-1).astype(m_sum.dtype)[..., None]
                    return safe_div(m_sum, cnt)
                return m_sum / num_nearest

            # ---- fully fused pair pipeline (ops/pallas/knn_layer.py) ----
            from ..ops.pallas.knn_layer import (
                fused_knn_messages,
                supports_fused_knn_layer,
            )

            # Opt-in only: measured on v5e, XLA's native gather + fused
            # elementwise pipeline on the (b, n, k, ·) tensors is FASTER than
            # this kernel (26 vs 60+ us fwd at n=1024, k=8, dim=32) — see the
            # measured-outcome note in ops/pallas/knn_layer.py.
            use_fused = (
                self.fused_knn
                and edges is None
                and self.update_coors
                and self.update_feats
                and (self.dropout == 0.0 or deterministic)
                and supports_fused_knn_layer(n, num_nearest, hidden_pad)
            )
            if use_fused:
                # Selection only (the fused kernel gathers in-kernel).
                # Pallas kernels on TPU, jnp fallback elsewhere; stop-grad,
                # so the O(n^2) pass stays out of the autodiff graph.
                nbhd = nb.knn_select(
                    coors, num_nearest, valid_radius, mask=mask, adj_mat=adj_b
                )
                if mask is not None:
                    mask_j = gather_bool(mask, nbhd.indices)
                    pv = (mask[:, :, None] & mask_j) & nbhd.valid
                else:
                    # reference quirk: validity filtering only under a mask
                    pv = jnp.ones(nbhd.indices.shape, bool)
                m_dim = self.m_dim
                m_sum, coors_delta = fused_knn_messages(
                    coors,
                    feats @ w_i + edge_b1,
                    feats @ w_j,
                    nbhd.indices,
                    pv.astype(jnp.int32),
                    fourier,
                    self.soft_edges,
                    self.norm_coors,
                    self.coor_weights_clamp_value,
                    1e-8,
                    False,
                    w_d,
                    edge_w2,
                    edge_b2,
                    gate_w if self.soft_edges else jnp.zeros((m_dim, 1), coors.dtype),
                    gate_b if self.soft_edges else jnp.zeros((1,), coors.dtype),
                    coors_w1,
                    coors_b1,
                    coors_w2,
                    coors_b2,
                    cn_scale if self.norm_coors else jnp.ones((1,), coors.dtype),
                )
                coors_out = coors + coors_delta
                node_out = node_update(pool_kernel_messages(m_sum, pv))
                return node_out, coors_out

            # Selection FUSED with the payload gather: one combined
            # [coors | mask | feats] gather (gathers are index/latency-bound
            # on TPU, not width-bound — one wide gather beats separate
            # narrow ones ~2x on the n=16384 layer fwd+bwd; the backward's
            # scatter-add combines the same way). On TPU selection auto-routes
            # to the exact Pallas kernels up to the full-band reach
            # (n <= 16384) and to the packed-tiled candidate kernel + exact
            # refine beyond it (ops/pallas/knn.py); selection is stop-gradient,
            # the gather is differentiable, and the O(n^2) pass never enters
            # autodiff.
            # wide=True: where the packed candidate kernels engage, the
            # result carries kc = k + slack slots plus a `winner` mask
            # instead of paying the k-compaction (see knn_select_gather);
            # this layer is mask-driven, so the slack slots just ride the
            # pair mask. Exact kernels return k-wide with winner=None.
            nbhd, g = nb.knn_select_gather(
                coors, num_nearest, valid_radius, mask=mask, adj_mat=adj_b,
                payload=feats, wide=True,
            )
            c_sp = coors.shape[-1]
            mask_j = None
            coors_j = g[..., :c_sp]
            off = c_sp
            if mask is not None:
                mask_j = g[..., off] > 0.5
                off += 1
            feats_j_gathered = g[..., off:].astype(feats.dtype)  # (b,n,k,d)

            # ---- opt-in: the combined gather FEEDS the pre-gathered fused
            # pair kernel (ops/pallas/pair_messages.py) — selection + ONE
            # wide gather + one kernel; no (b, n, k, hidden) XLA pipeline.
            # Composes with wide=True above: the kernel aggregates over the
            # kc candidate slots under the winner mask (slots padded to a
            # sublane multiple with pv=0). Pending on-chip measurement
            # (benchmarks/ab_wide.py arms) before any auto default.
            if self.fused_pairs:
                from ..ops.pallas.pair_messages import (
                    fused_pair_messages, supports_fused_pair_messages)
                kk = g.shape[2]
                kpad = (-kk) % 8
                on_tpu = jax.default_backend() == "tpu"
                if (edges is None and self.update_coors and self.update_feats
                        and not dropout_active
                        and supports_fused_pair_messages(
                            n, kk + kpad, hidden_pad, self.m_dim, d,
                            backend="tpu")):
                    # pair validity, reference order incl. the no-mask
                    # radius quirk (see pair_mask below); wide results carry
                    # winner inside nbhd.valid already
                    if mask is not None:
                        pvm = (mask[:, :, None] & mask_j) & nbhd.valid
                    elif nbhd.winner is not None:
                        pvm = nbhd.winner
                    else:
                        pvm = jnp.ones((b, n, kk), bool)
                    if kpad:
                        zpad = ((0, 0), (0, 0), (0, kpad))
                        pvm = jnp.pad(pvm, zpad)
                        coors_j = jnp.pad(coors_j, zpad + ((0, 0),))
                        feats_j_gathered = jnp.pad(
                            feats_j_gathered, zpad + ((0, 0),))
                    k2 = kk + kpad
                    dummy1 = jnp.zeros((self.m_dim, 1), coors.dtype)
                    m_sum, cdelta = fused_pair_messages(
                        coors,
                        coors_j.reshape(b, n * k2, -1),
                        feats_j_gathered.reshape(b, n * k2, d),
                        feats @ w_i + edge_b1,
                        pvm.reshape(b, n * k2, 1).astype(jnp.float32),
                        fourier, self.soft_edges, self.norm_coors,
                        self.coor_weights_clamp_value, 1e-8,
                        not on_tpu,   # interpret off-TPU (parity tests)
                        on_tpu,       # mxu_bf16: XLA-default MXU mode
                        False,        # dense gate semantics (gate everywhere)
                        w_j, w_d, edge_w2, edge_b2,
                        gate_w if self.soft_edges else dummy1,
                        gate_b if self.soft_edges else dummy1[:1, 0],
                        coors_w1, coors_b1, coors_w2, coors_b2,
                        cn_scale if self.norm_coors else jnp.ones(
                            (1,), coors.dtype),
                    )
                    coors_out = coors + cdelta.astype(coors.dtype)
                    m_i = pool_kernel_messages(m_sum, pvm)
                    return node_update(m_i.astype(feats.dtype)), coors_out

            rel_coors = coors[:, :, None, :] - coors_j
            rel_dist = jnp.sum(rel_coors**2, axis=-1)
            if edges is not None:
                edges = batched_index_select(edges, nbhd.indices, axis=2)
        else:
            rel_coors, rel_dist = nb.pairwise_geometry(coors)  # (b,n,n,c), (b,n,n)

        # ---- distance features ----
        if fourier > 0:
            dist_feats = fourier_encode_dist(rel_dist, num_encodings=fourier)
        else:
            dist_feats = rel_dist[..., None]

        # ---- factorized edge MLP layer 1 ----
        if use_nearest:
            # Project the (already gathered) dim-wide features per-pair
            # instead of gathering the hidden-wide projection: identical
            # math, but the gather (and its scatter-add transpose in the
            # backward) moves hidden/dim (~4x) less data; the extra
            # (b,n,k,dim)@(dim,hidden) matmul is nearly free on the MXU.
            proj_j = mp(feats_j_gathered) @ mp(w_j)
            # i-side: per-PAIR matmul on the narrow broadcast rows, NOT
            # per-node + hidden-wide broadcast — the broadcast fuses into
            # the matmul operand read, and the backward reduces the
            # dim-wide d_feats over k instead of the hidden-wide dh1
            # (measured 9.3 vs 12.6 us fwd+bwd at flagship shapes,
            # benchmarks/ab_dense_i.py; same row dots, same order —
            # bitwise identical).
            kk_i = proj_j.shape[2]
            proj_i_pair = jnp.broadcast_to(
                mp(feats)[:, :, None, :], (b, n, kk_i, d)) @ mp(w_i)
            h1 = proj_i_pair + proj_j \
                + mp(dist_feats) @ mp(w_d) + mp(edge_b1)
        else:
            proj_i = mp(feats) @ mp(w_i)  # (b, n, hidden)
            proj_j = (mp(feats) @ mp(w_j))[:, None, :, :]  # (b,1,n,h)
            h1 = proj_i[:, :, None, :] + proj_j \
                + mp(dist_feats) @ mp(w_d) + mp(edge_b1)
        if edges is not None:
            h1 = h1 + mp(edges) @ mp(w_e)

        m_ij = _silu(drop(h1, deterministic=deterministic))
        m_ij = _silu(m_ij @ mp(edge_w2) + mp(edge_b2))  # (b, n, j, m_dim)

        if self.soft_edges:
            m_ij = m_ij * jax.nn.sigmoid(m_ij @ mp(gate_w) + mp(gate_b))

        # ---- pair mask (reference order: mask_i * mask_j [& nbhd]) ----
        pair_mask = None
        if mask is not None:
            if use_nearest:
                # mask_j came along with the coordinate gather above
                pair_mask = (mask[:, :, None] & mask_j) & nbhd.valid
            else:
                pair_mask = mask[:, :, None] & mask[:, None, :]
        elif use_nearest and nbhd.winner is not None:
            # wide kc-slot result without a node mask: the reference sums all
            # k SELECTED slots unconditionally (egnn_pytorch.py:292 — the
            # nbhd radius mask applies only through `mask`), so here exactly
            # the winner slots participate, radius ignored.
            pair_mask = nbhd.winner

        # ---- coordinate update (equivariant) ----
        if self.update_coors:
            cw = _silu(drop(m_ij @ mp(coors_w1) + mp(coors_b1), deterministic=deterministic))
            # back to full precision BEFORE weighting geometry; keep the
            # trailing singleton (a squeeze + einsum costs an extra layout
            # pass vs a broadcast multiply-sum)
            coor_weights = (cw @ mp(coors_w2) + mp(coors_b2)).astype(
                coors.dtype
            )  # (b, n, j, 1)

            rel_coors_n = coors_norm(rel_coors, cn_scale) if self.norm_coors else rel_coors

            if pair_mask is not None:
                coor_weights = jnp.where(pair_mask[..., None], coor_weights, 0.0)
            if self.coor_weights_clamp_value is not None:
                c = self.coor_weights_clamp_value
                coor_weights = jnp.clip(coor_weights, -c, c)

            coors_out = jnp.sum(coor_weights * rel_coors_n, axis=-2) + coors
        else:
            coors_out = coors

        # ---- feature update (invariant) ----
        if self.update_feats:
            if pair_mask is not None:
                m_ij = jnp.where(pair_mask[..., None], m_ij, 0.0)

            if self.m_pool_method == "mean":
                if pair_mask is not None:
                    mask_sum = pair_mask[..., None].sum(axis=-2).astype(m_ij.dtype)
                    m_i = safe_div(m_ij.sum(axis=-2), mask_sum)
                else:
                    m_i = m_ij.mean(axis=-2)
            else:  # sum
                m_i = m_ij.sum(axis=-2)

            node_out = node_update(m_i, mp)
        else:
            node_out = feats

        return node_out, coors_out


class EGNNNetwork(nn.Module):
    """Depth-N dense EGNN stack with embeddings, adjacency-degree expansion and
    interleaved global linear attention (egnn_pytorch.py:343-454).

    ``layer_kwargs`` forwards extra EGNN options (the reference's ``**kwargs``
    passthrough at egnn_pytorch.py:387); ``norm_feats=True`` is forced, as in
    the reference.
    """

    depth: int
    dim: int
    num_tokens: Optional[int] = None
    num_edge_tokens: Optional[int] = None
    num_positions: Optional[int] = None
    edge_dim: int = 0
    num_adj_degrees: Optional[int] = None
    adj_dim: int = 0
    global_linear_attn_every: int = 0
    global_linear_attn_heads: int = 8
    global_linear_attn_dim_head: int = 64
    num_global_tokens: int = 4
    layer_kwargs: Any = None  # dict of extra EGNN options

    @nn.compact
    def __call__(
        self,
        feats: jnp.ndarray,
        coors: jnp.ndarray,
        adj_mat: Optional[jnp.ndarray] = None,
        edges: Optional[jnp.ndarray] = None,
        mask: Optional[jnp.ndarray] = None,
        return_coor_changes: bool = False,
        deterministic: bool = True,
    ):
        assert not (self.num_adj_degrees is not None and self.num_adj_degrees < 1), (
            "make sure adjacent degrees is greater than 1"
        )
        b = feats.shape[0]
        kwargs = dict(self.layer_kwargs or {})

        if self.num_tokens is not None:
            token_emb = self.param(
                "token_emb", inits.unit_normal_init, (self.num_tokens, self.dim)
            )
            feats = token_emb[feats]

        if self.num_positions is not None:
            n = feats.shape[1]
            assert n <= self.num_positions, (
                f"given sequence length {n} must be less than the number of "
                f"positions {self.num_positions} set at init"
            )
            pos_emb = self.param(
                "pos_emb", inits.unit_normal_init, (self.num_positions, self.dim)
            )
            feats = feats + pos_emb[None, :n, :]

        has_edges = self.edge_dim > 0
        if edges is not None and self.num_edge_tokens is not None:
            edge_emb = self.param(
                "edge_emb", inits.unit_normal_init, (self.num_edge_tokens, self.edge_dim)
            )
            edges = edge_emb[edges]

        edge_dim = self.edge_dim if has_edges else 0
        adj_dim = self.adj_dim if self.num_adj_degrees is not None else 0

        # Nth-degree adjacency expansion with per-degree embedding
        # (egnn_pytorch.py:414-432). NOTE: layers below see the *expanded* adj.
        if self.num_adj_degrees is not None:
            assert adj_mat is not None, (
                "adjacency matrix must be passed in (keyword argument adj_mat)"
            )
            if adj_mat.ndim == 2:
                adj_mat = jnp.broadcast_to(adj_mat, (b,) + adj_mat.shape)
            adj_mat, adj_indices = nb.expand_adjacency_degrees(adj_mat, self.num_adj_degrees)
            if adj_dim > 0:
                adj_emb = self.param(
                    "adj_emb", inits.unit_normal_init, (self.num_adj_degrees + 1, self.adj_dim)
                )
                adj_feats = adj_emb[adj_indices]
                edges = (
                    jnp.concatenate([edges, adj_feats], axis=-1)
                    if edges is not None
                    else adj_feats
                )

        has_global_attn = self.global_linear_attn_every > 0
        global_tokens = None
        if has_global_attn:
            tokens = self.param(
                "global_tokens", inits.unit_normal_init, (self.num_global_tokens, self.dim)
            )
            global_tokens = jnp.broadcast_to(tokens, (b,) + tokens.shape)

        coor_changes = [coors]
        for ind in range(self.depth):
            is_global_layer = has_global_attn and (ind % self.global_linear_attn_every) == 0
            if is_global_layer:
                feats, global_tokens = GlobalLinearAttention(
                    dim=self.dim,
                    heads=self.global_linear_attn_heads,
                    dim_head=self.global_linear_attn_dim_head,
                    name=f"global_attn_{ind}",
                )(feats, global_tokens, mask=mask)

            feats, coors = EGNN(
                dim=self.dim,
                edge_dim=edge_dim + adj_dim,
                norm_feats=True,
                name=f"egnn_{ind}",
                **kwargs,
            )(
                feats,
                coors,
                edges=edges,
                mask=mask,
                adj_mat=adj_mat,
                deterministic=deterministic,
            )
            coor_changes.append(coors)

        if return_coor_changes:
            return feats, coors, coor_changes
        return feats, coors
