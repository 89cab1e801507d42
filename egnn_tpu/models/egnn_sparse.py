"""Sparse/COO-path E(n)-equivariant GNN.

TPU-native re-implementation of the reference's PyG path
(egnn_pytorch_geometric.py:99-439) without any torch-geometric machinery:
messages are computed per-edge on a *static-capacity* COO edge list
(``edge_index`` (2, E) + optional ``edge_mask`` for padding), and PyG's
torch-scatter aggregation becomes XLA segment reductions
(egnn_tpu/ops/segment.py). Static shapes throughout — pad E to a bucket and
mask the tail, the TPU idiom for variable-size graphs.

Layout contract matches PyG/the reference exactly:
- ``x`` is (N, pos_dim + feats_dim), coordinates first
  (egnn_pytorch_geometric.py:193); output is ``[coors_out | hidden_out]``.
- messages flow source -> target: j = edge_index[0], i = edge_index[1];
  ``rel_coors = coors[j] - coors[i]`` (egnn_pytorch_geometric.py:195 — note
  the *opposite* sign convention from the dense path).
- edge MLP input is ``[x_i, x_j, edge_attr, dist_feats]`` (edge_attr before
  distance — egnn_pytorch_geometric.py:202-205, also opposite of dense).
- the soft-edge gate applies only to the *feature* aggregation, after the
  coordinate update consumed the ungated messages
  (egnn_pytorch_geometric.py:254-257).
- node norm is PyG's graph-mode LayerNorm (statistics over all node x channel
  entries per graph — egnn_pytorch_geometric.py:156).
- init is xavier-normal weights + zero biases (egnn_pytorch_geometric.py:176-180),
  different from the dense path's Normal(1e-3).

Deliberate fix-forwards of latent reference bugs (documented divergences):
- ``coor_weights_clamp_value`` is honored (the reference ctor discards it and
  its clamp branch references undefined names — egnn_pytorch_geometric.py:137,
  241-243).
- the global-attention interleave in the network works (the reference's
  ordering bug at :388 vs :426-429 made it crash), using segment-softmax
  attention instead of a per-graph Python loop (the reference's
  ``Attention_Sparse.sparse_forward`` loop crashes on multi-graph input, :52).
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.core import (embed_tokens, fourier_encode_dist, gather_rows,
                        gather_rows_blocked, layer_norm, coors_norm)
from ..ops.segment import (graph_layer_norm, segment_aggregate,
                           segment_softmax, segment_sum, uniform_aggregate)
from . import init as inits


def _silu(x):
    return x * jax.nn.sigmoid(x)


class EGNNSparse(nn.Module):
    """One COO-edge E(n)-equivariant message-passing layer (capability parity
    with EGNN_Sparse, egnn_pytorch_geometric.py:99-271)."""

    feats_dim: int
    pos_dim: int = 3
    edge_attr_dim: int = 0
    m_dim: int = 16
    fourier_features: int = 0
    soft_edge: int = 0
    norm_feats: bool = False
    norm_coors: bool = False
    norm_coors_scale_init: float = 1e-2
    update_feats: bool = True
    update_coors: bool = True
    dropout: float = 0.0
    coor_weights_clamp_value: Optional[float] = None
    aggr: str = "add"
    # TPU-native extras (absent in the reference):
    # compute_dtype: mixed-precision policy for the message path (see
    # models/egnn.py — same contract: params and geometry stay full
    # precision, message MLPs run in e.g. bfloat16).
    compute_dtype: Any = None
    # uniform_degree: static receiver degree of a receiver-major edge
    # layout (the layout every ops/graph.py kNN builder and
    # native.batched_knn_graph_np emit: edge rows [i*k, (i+1)*k) belong to
    # receiver i BY POSITION; masked padding stays in its slot). When set,
    # receiver gathers become broadcasts and segment reductions become dense
    # reshape-reduces — no scatter in forward OR backward. Composes with
    # shard_axis when edges are sharded by slicing the uniform layout
    # (parallel/sparse_partition.py:partition_uniform_edges); plain
    # partition_edges repacks rows by receiver id and breaks the positional
    # contract.
    uniform_degree: Optional[int] = None
    # fused_uniform: run the whole per-edge pipeline as ONE Pallas kernel on
    # the uniform-degree layout (ops/pallas/pair_messages.py). True forces
    # it when supported (edge_attr_dim == 0, both updates on, aggr in
    # add/sum/mean, k a sublane multiple; interpret-mode off-TPU — slow,
    # parity tests); False forces the XLA per-edge path. None = auto,
    # which currently resolves to OFF: the dense analog of this kernel
    # measured-and-lost as a default (CLAUDE.md), so the sparse default
    # flips only after an on-chip win is recorded (harnesses:
    # benchmarks/kbench.py:bench_fused_uniform_sparse, bench_all anchor-5
    # arms). When the kernel engages it supersedes compute_dtype: matmuls
    # run the XLA-default bf16-operand MXU scheme with f32 accumulation,
    # geometry stays f32.
    fused_uniform: Optional[bool] = None
    # uniform_graph_size: static per-graph node count of a CONTIGUOUS
    # ``batch`` layout (node rows [g*s, (g+1)*s) belong to graph g BY
    # POSITION — what every batched builder here emits, and what PyG
    # batching produces for equal-size graphs). When set together with
    # uniform_degree, two index-bound op classes leave the layer:
    # (a) the sender row gather becomes a block-local one-hot matmul on
    #     the MXU (ops/core.py:gather_rows_blocked — graphs never share
    #     edges, so senders are block-local by construction), and
    # (b) graph-LayerNorm statistics reduce by reshape instead of
    #     segment-scatter + per-node gathers (ops/segment.py).
    # Measured v5e, anchor-5 shapes: gather 46.5 us and LayerNorm 69.0 us
    # fwd+bwd per layer on the general paths. Ignored under shard_axis.
    uniform_graph_size: Optional[int] = None
    # mesh axis name for the
    # edge-partitioned multi-device layout (parallel/sparse_partition.py).
    # When set, this layer must run inside shard_map with nodes sharded on
    # that axis: ``x`` is the local node shard, ``edge_index[1]`` holds
    # LOCAL receiver ids (this shard owns its receivers), ``edge_index[0]``
    # holds GLOBAL sender ids resolved against an all-gather of the node
    # tensor over ICI; graph-LayerNorm statistics are psum'd to global.
    shard_axis: Optional[str] = None

    def _linear(self, name, d_in, d_out):
        w = self.param(f"{name}_w", inits.xavier_normal_init, (d_in, d_out))
        b = self.param(f"{name}_b", inits.zeros_init, (d_out,))
        return w, b

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,              # (N, pos_dim + feats_dim)
        edge_index: jnp.ndarray,     # (2, E) int — [senders/j, receivers/i]
        edge_attr: Optional[jnp.ndarray] = None,  # (E, edge_attr_dim)
        batch: Optional[jnp.ndarray] = None,      # (N,) graph ids
        edge_mask: Optional[jnp.ndarray] = None,  # (E,) bool; False = padding
        num_graphs: int = 1,
        node_mask: Optional[jnp.ndarray] = None,  # (N,) bool; False = padding
        deterministic: bool = True,
    ) -> jnp.ndarray:
        assert self.aggr in {"add", "sum", "max", "mean"}, "pool method must be a valid option"
        assert self.update_feats or self.update_coors, (
            "you must update either features, coordinates, or both"
        )
        n = x.shape[0]
        d = self.feats_dim
        uk = self.uniform_degree
        if uk is not None:
            # With shard_axis, n is the local node count and the edges must
            # be the shard's contiguous row range of a globally uniform
            # layout (parallel/sparse_partition.py:partition_uniform_edges —
            # NOT partition_edges, which repacks by receiver id and breaks
            # the positional contract).
            assert edge_index.shape[1] == n * uk, (
                f"uniform_degree={uk} needs exactly n*k={n * uk} edge rows, "
                f"got {edge_index.shape[1]}"
            )
        dist_dim = 2 * self.fourier_features + 1
        ein = dist_dim + self.edge_attr_dim + 2 * d
        hidden = ein * 2

        coors = x[:, : self.pos_dim]
        feats = x[:, self.pos_dim :]
        j_idx = edge_index[0]
        i_idx = edge_index[1]

        edge_w1, edge_b1 = self._linear("edge_mlp_0", ein, hidden)
        edge_w2, edge_b2 = self._linear("edge_mlp_1", hidden, self.m_dim)
        if self.soft_edge:
            gate_w, gate_b = self._linear("edge_weight", self.m_dim, 1)
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

        # per-edge geometry (reference sign convention: coors[j] - coors[i]).
        # Edge-partitioned mode: senders are global ids into the all-gathered
        # node set (the halo exchange — one all-gather over ICI per layer).
        if self.shard_axis is not None:
            x_full = jax.lax.all_gather(x, self.shard_axis, axis=0, tiled=True)
        else:
            x_full = x

        # block-local gather under the uniform-graph-size contract (see the
        # uniform_graph_size field note); needs the receiver-major uniform
        # edge layout so edge rows group per graph by position
        ugs = self.uniform_graph_size if self.shard_axis is None else None
        if ugs is not None:
            assert n % ugs == 0, (
                f"uniform_graph_size={ugs} must divide the node count {n}"
            )
            # Validate the positional contract when the inputs are CONCRETE
            # (trace-time arrays pass through silently — the contract cannot
            # be checked on tracers without paying a runtime check in every
            # step). A violating layout would make gather_rows_blocked
            # silently gather zeros (ops/core.py docstring) and the reshape
            # LayerNorm compute cross-graph statistics.
            # numpy, not jnp: under jit tracing even constant-input jnp ops
            # stage out to tracers (omnistaging), which would make the bool()
            # below raise; host numpy keeps the check trace-time-only.
            import numpy as _np
            if batch is not None and not isinstance(batch, jax.core.Tracer):
                bh = _np.asarray(batch)
                assert bool(_np.all(bh == _np.arange(n) // ugs)), (
                    "uniform_graph_size requires a contiguous equal-size "
                    "batch layout: batch[i] == i // uniform_graph_size"
                )
            if (uk is not None
                    and not isinstance(edge_index, jax.core.Tracer)
                    and not isinstance(edge_mask, jax.core.Tracer)):
                ei = _np.asarray(edge_index)
                # padding rows (edge_mask False) carry fill indices and are
                # zeroed before aggregation — only live rows must honor the
                # positional layout.
                live = (_np.ones(ei.shape[1], bool) if edge_mask is None
                        else _np.asarray(edge_mask).astype(bool))
                rows_ok = _np.all(
                    (ei[1] == _np.arange(ei.shape[1]) // uk)[live]
                )
                block_ok = _np.all((ei[0] // ugs == ei[1] // ugs)[live])
                assert bool(rows_ok), (
                    "uniform_degree + uniform_graph_size requires the "
                    "positional receiver-major layout (row e has receiver "
                    "e // k) — use partition_uniform_edges / the kNN "
                    "builders, not partition_edges"
                )
                assert bool(block_ok), (
                    "uniform_graph_size requires block-local edges (sender "
                    "and receiver in the same graph block); got edges "
                    "crossing graph boundaries"
                )

        def gather_j(vals, idx):
            if ugs is not None and uk is not None:
                return gather_rows_blocked(vals, idx, n // ugs, ugs)
            return gather_rows(vals, idx)

        # ---- fused uniform-degree pair pipeline (ops/pallas/pair_messages) ----
        # The uniform receiver-major layout IS the dense path's pre-gathered
        # i-major pair layout (row e belongs to receiver e//uk), so the whole
        # per-edge pipeline — geometry, Fourier, edge MLP, gate, coors-weight
        # MLP, CoorsNorm, clamp, masking, both k-reductions — runs as one
        # Pallas kernel over the gathered sender rows. XLA keeps the row
        # gather (and its scatter-add transpose in the backward). Opt-in
        # until the on-chip A/B lands (see the fused_uniform field note);
        # forcing True off-TPU runs the interpret-mode kernel (slow, for
        # parity tests).
        want_fused = bool(self.fused_uniform)
        use_fused = False
        if want_fused and uk is not None:
            from ..ops.pallas.pair_messages import (
                fused_pair_messages, supports_fused_pair_messages)
            on_tpu = jax.default_backend() == "tpu"
            use_fused = (
                self.edge_attr_dim == 0
                and self.update_coors and self.update_feats
                and (self.dropout == 0.0 or deterministic)
                and self.aggr in ("add", "sum", "mean")
                and supports_fused_pair_messages(
                    n, uk, hidden, self.m_dim, d,
                    backend="tpu" if self.fused_uniform else None)
            )
        if use_fused:
            xg_j = gather_j(x_full, j_idx)          # (E, pos+feats)
            cj = xg_j[None, :, : self.pos_dim]
            fj = xg_j[None, :, self.pos_dim:]
            proj_i = (feats @ edge_w1[:d] + edge_b1)[None]    # (1, N, hidden)
            pv = (
                edge_mask.astype(jnp.float32)[None, :, None]
                if edge_mask is not None
                else jnp.ones((1, n * uk, 1), jnp.float32)
            )
            dummy1 = jnp.zeros((self.m_dim, 1), coors.dtype)
            m_sum, cd = fused_pair_messages(
                coors[None], cj, fj, proj_i, pv,
                self.fourier_features, bool(self.soft_edge), self.norm_coors,
                self.coor_weights_clamp_value, 1e-8,
                not on_tpu,          # interpret off-TPU (parity tests)
                on_tpu,              # mxu_bf16: XLA-default MXU mode on TPU
                True,                # gate_feats_only: sparse gate semantics
                edge_w1[d:2 * d], edge_w1[2 * d:], edge_w2, edge_b2,
                gate_w if self.soft_edge else dummy1,
                gate_b if self.soft_edge else dummy1[:1, 0],
                coors_w1, coors_b1, coors_w2, coors_b2,
                cn_scale if self.norm_coors else jnp.ones((1,), coors.dtype),
            )
            m_i, cd = m_sum[0], cd[0]
            if self.aggr == "mean":
                if edge_mask is not None:
                    cnt = jnp.maximum(
                        pv[0].reshape(n, uk).sum(axis=1, keepdims=True), 1.0)
                else:
                    cnt = jnp.float32(uk)
                m_i, cd = m_i / cnt, cd / cnt
            # sparse sign convention: rel = c_j - c_i = -(kernel rel), so the
            # aggregated kernel delta enters with a minus
            coors_out = coors - cd.astype(coors.dtype)
            m_i = m_i.astype(feats.dtype)
            return jnp.concatenate(
                [coors_out,
                 self._feature_update(
                     feats, m_i, batch, num_graphs, node_mask, drop,
                     deterministic,
                     (nn_gamma, nn_beta) if self.norm_feats else None,
                     (node_w1, node_b1, node_w2, node_b2))],
                axis=-1)

        # ONE row gather per edge endpoint carrying [coors | feats]; narrow
        # gathers are latency-bound on TPU and each separate gather costs a
        # separate scatter-add transpose in the backward (gather_rows routes
        # that through the Pallas segment-sum).
        if uk is not None:
            # receiver-major uniform degree: row e belongs to receiver e//uk,
            # so the i-side "gather" is a NARROW positional broadcast per
            # operand (transpose = reshape-sum over k). Measured round 4
            # (benchmarks/ab_sparse_i.py): keep the i-side edge-MLP matmul
            # PER-EDGE on these broadcast rows — projecting per-node and
            # broadcasting the hidden-wide result is 1.6x SLOWER fwd+bwd
            # (12.1 -> 19.7 us at E=8192, d=64, h=274): the wide (E, h)
            # broadcast + its (n, k, h) reduction move ~4x the bytes of the
            # narrow (E, d) broadcast, while the extra matmul FLOPs ride
            # free on the MXU.
            coors_i_e = jnp.broadcast_to(
                coors[:, None, :], (n, uk, self.pos_dim)
            ).reshape(n * uk, self.pos_dim)
            feats_i_e = jnp.broadcast_to(
                feats[:, None, :], (n, uk, d)
            ).reshape(n * uk, d)
        else:
            xg_i = gather_rows(x, i_idx)      # (E, pos+feats)
            coors_i_e = xg_i[:, : self.pos_dim]
            feats_i_e = xg_i[:, self.pos_dim :]
        xg_j = gather_j(x_full, j_idx)
        coors_j_e = xg_j[:, : self.pos_dim]
        feats_j_e = xg_j[:, self.pos_dim :]
        rel_coors = coors_j_e - coors_i_e
        rel_dist = jnp.sum(rel_coors**2, axis=-1, keepdims=True)

        if self.fourier_features > 0:
            dist_feats = fourier_encode_dist(
                rel_dist[..., 0], num_encodings=self.fourier_features
            )
        else:
            dist_feats = rel_dist

        # Factorized first layer of the edge MLP: input layout is
        # [x_i, x_j, edge_attr, dist_feats] (egnn_pytorch_geometric.py:202-214),
        # so the two (N, d) @ (d, hidden) projections run per-node, not per-edge.
        w_i = edge_w1[:d]
        w_j = edge_w1[d : 2 * d]
        w_e = edge_w1[2 * d : 2 * d + self.edge_attr_dim]
        w_d = edge_w1[2 * d + self.edge_attr_dim :]

        # project the gathered dim-wide features per-edge (the hidden-wide
        # per-node projection would make the gather/scatter ~4x wider);
        # mp = mixed-precision cast for the message path (no-op by default)
        mp = (
            (lambda v: v.astype(self.compute_dtype))
            if self.compute_dtype is not None
            else (lambda v: v)
        )
        h1 = mp(feats_i_e) @ mp(w_i) + mp(feats_j_e) @ mp(w_j) \
            + mp(dist_feats) @ mp(w_d) + mp(edge_b1)
        if self.edge_attr_dim > 0:
            assert edge_attr is not None, (
                f"layer built with edge_attr_dim={self.edge_attr_dim} but no edge_attr given"
            )
            h1 = h1 + mp(edge_attr) @ mp(w_e)

        m_ij = _silu(drop(h1, deterministic=deterministic))
        m_ij = _silu(m_ij @ mp(edge_w2) + mp(edge_b2))  # (E, m_dim)

        # ---- coordinate update ----
        if self.update_coors:
            cw = _silu(drop(m_ij @ mp(coors_w1) + mp(coors_b1), deterministic=deterministic))
            # back to full precision BEFORE weighting geometry
            coor_wij = (cw @ mp(coors_w2) + mp(coors_b2)).astype(coors.dtype)  # (E, 1)
            if self.coor_weights_clamp_value is not None:
                # fix-forward: reference discards this option (see module docstring)
                c = self.coor_weights_clamp_value
                coor_wij = jnp.clip(coor_wij, -c, c)
            rel_out = coors_norm(rel_coors, cn_scale) if self.norm_coors else rel_coors
            if uk is not None:
                mhat_i = uniform_aggregate(
                    self.aggr, coor_wij * rel_out, uk, mask=edge_mask
                )
            else:
                mhat_i = segment_aggregate(
                    self.aggr, coor_wij * rel_out, i_idx, n, mask=edge_mask
                )
            coors_out = coors + mhat_i
        else:
            coors_out = coors

        # ---- feature update ----
        if self.update_feats:
            if self.soft_edge:
                m_ij = m_ij * jax.nn.sigmoid(m_ij @ mp(gate_w) + mp(gate_b))
            if uk is not None:
                m_i = uniform_aggregate(
                    self.aggr, m_ij.astype(feats.dtype), uk, mask=edge_mask
                )
            else:
                m_i = segment_aggregate(
                    self.aggr, m_ij.astype(feats.dtype), i_idx, n, mask=edge_mask
                )
            hidden_out = self._feature_update(
                feats, m_i, batch, num_graphs, node_mask, drop, deterministic,
                (nn_gamma, nn_beta) if self.norm_feats else None,
                (node_w1, node_b1, node_w2, node_b2))
        else:
            hidden_out = feats

        return jnp.concatenate([coors_out, hidden_out], axis=-1)

    def _feature_update(self, feats, m_i, batch, num_graphs, node_mask, drop,
                        deterministic, norm_params, mlp_params):
        """Shared node-update tail: optional graph-LayerNorm, then the node
        MLP residual (egnn_pytorch_geometric.py:259-266)."""
        node_w1, node_b1, node_w2, node_b2 = mlp_params
        if norm_params is not None:
            # node_mask keeps padded capacity slots out of the per-graph
            # statistics (the reference's PyG LayerNorm never sees
            # padding because PyG doesn't pad; static-capacity batches
            # must mask it explicitly)
            nn_gamma, nn_beta = norm_params
            hidden_feats = graph_layer_norm(
                feats, batch, num_graphs, nn_gamma, nn_beta,
                node_mask=node_mask, axis_name=self.shard_axis,
                uniform_size=(
                    self.uniform_graph_size if self.shard_axis is None
                    else None),
            )
        else:
            hidden_feats = feats
        h = jnp.concatenate([hidden_feats, m_i], axis=-1)
        h = _silu(drop(h @ node_w1 + node_b1, deterministic=deterministic))
        return feats + (h @ node_w2 + node_b2)


class AttentionSparse(nn.Module):
    """Segmented multi-head cross attention between per-graph global tokens and
    packed node sets (capability parity with Attention_Sparse,
    egnn_pytorch_geometric.py:32-57, whose per-graph Python loop is replaced by
    static segment-softmax — no dynamic shapes, no recursion, works for any
    number of graphs under jit)."""

    dim: int
    heads: int = 8
    dim_head: int = 64

    def setup(self):
        # torch Linear defaults, like the reference's Attention_Sparse (it
        # inherits dense Attention's ctor, egnn_pytorch_geometric.py:32 ->
        # egnn_pytorch.py:88-90; the sparse xavier+zero-bias scheme applies
        # only to EGNN_Sparse's own MLPs).
        inner = self.heads * self.dim_head
        self.wq = self.param("to_q_w", inits.torch_linear_weight_init, (self.dim, inner))
        self.wkv = self.param("to_kv_w", inits.torch_linear_weight_init, (self.dim, inner * 2))
        self.wo = self.param("to_out_w", inits.torch_linear_weight_init, (inner, self.dim))
        self.bo = self.param("to_out_b", inits.torch_linear_bias_init(inner), (self.dim,))

    def queries_to_nodes(
        self,
        queries: jnp.ndarray,   # (G, g, dim) per-graph query tokens
        x: jnp.ndarray,         # (N, dim) packed nodes
        batch: jnp.ndarray,     # (N,) graph ids
        num_graphs: int,
        node_mask: Optional[jnp.ndarray] = None,
        axis_name: Optional[str] = None,
    ) -> jnp.ndarray:
        """Tokens attend over their graph's nodes -> (G, g, dim).

        ``axis_name``: node rows block-sharded over a mesh axis — the
        segment-softmax statistics and the induced-token aggregation are
        psum'd so every shard sees the global attention result (queries are
        replicated)."""
        h, dh = self.heads, self.dim_head
        wq, wkv, wo, bo = self.wq, self.wkv, self.wo, self.bo
        G, g, _ = queries.shape
        n = x.shape[0]

        q = (queries @ wq).reshape(G, g, h, dh)
        kv = x @ wkv
        k, v = jnp.split(kv, 2, axis=-1)
        k = k.reshape(n, h, dh)
        v = v.reshape(n, h, dh)

        # logits[n, g, h] = q[batch[n], g, h] . k[n, h]
        qn = q[batch]  # (N, g, h, dh)
        logits = jnp.einsum("nghd,nhd->ngh", qn, k) * (dh**-0.5)
        flat = logits.reshape(n, g * h)
        m = None if node_mask is None else node_mask[:, None] & jnp.ones_like(flat, bool)
        attn = segment_softmax(flat, batch, num_graphs, mask=m,
                               axis_name=axis_name)  # (N, g*h)
        attn = attn.reshape(n, g, h)
        ctx = jnp.einsum("ngh,nhd->nghd", attn, v).reshape(n, g * h * dh)
        induced = segment_sum(ctx, batch, num_graphs)
        if axis_name is not None:
            induced = jax.lax.psum(induced, axis_name)
        induced = induced.reshape(G, g, h * dh)
        return induced @ wo + bo

    def nodes_to_queries(
        self,
        x: jnp.ndarray,         # (N, dim)
        context: jnp.ndarray,   # (G, g, dim) induced tokens
        batch: jnp.ndarray,
    ) -> jnp.ndarray:
        """Nodes attend over their graph's (few) tokens -> (N, dim)."""
        h, dh = self.heads, self.dim_head
        wq, wkv, wo, bo = self.wq, self.wkv, self.wo, self.bo
        G, g, _ = context.shape
        n = x.shape[0]

        q = (x @ wq).reshape(n, h, dh)
        kv = context @ wkv
        k, v = jnp.split(kv, 2, axis=-1)
        k = k.reshape(G, g, h, dh)[batch]  # (N, g, h, dh)
        v = v.reshape(G, g, h, dh)[batch]
        logits = jnp.einsum("nhd,nghd->ngh", q, k) * (dh**-0.5)
        attn = jax.nn.softmax(logits, axis=1)  # over the g tokens
        out = jnp.einsum("ngh,nghd->nhd", attn, v).reshape(n, h * dh)
        return out @ wo + bo


class GlobalLinearAttentionSparse(nn.Module):
    """Per-graph induced-token attention block for packed node sets
    (capability parity with GlobalLinearAttention_Sparse,
    egnn_pytorch_geometric.py:60-94, which is unconstructable in the reference
    due to a typo'd module path). Node-stream norms are PyG graph-mode
    LayerNorms; the feed-forward residual follows the reference's sparse
    variant (``ff(x_norm) + x_norm``, :92-93 — not the dense ``ff(x) + x``)."""

    dim: int
    heads: int = 8
    dim_head: int = 64
    # Mesh axis of the block-sharded node set (parallel/sparse_partition.py
    # layout): per-graph LayerNorm stats, the token->node segment softmax and
    # the induced aggregation all psum over it, so the sharded result matches
    # the unsharded one (nodes_to_queries is purely local).
    axis_name: Optional[str] = None
    # see EGNNSparse.uniform_graph_size — reshape LayerNorm statistics for
    # contiguous equal-size batched graphs (ignored under axis_name)
    uniform_graph_size: Optional[int] = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,          # (N, dim) packed node feats
        queries: jnp.ndarray,    # (G, g, dim)
        batch: jnp.ndarray,      # (N,)
        num_graphs: int,
        node_mask: Optional[jnp.ndarray] = None,
    ):
        d = self.dim
        g_seq = self.param("norm_seq_gamma", inits.ones_init, (d,))
        b_seq = self.param("norm_seq_beta", inits.zeros_init, (d,))
        g_q = self.param("norm_queries_gamma", inits.ones_init, (d,))
        b_q = self.param("norm_queries_beta", inits.zeros_init, (d,))

        ugs = self.uniform_graph_size if self.axis_name is None else None
        res_x, res_queries = x, queries
        xn = graph_layer_norm(x, batch, num_graphs, g_seq, b_seq,
                              node_mask=node_mask, axis_name=self.axis_name,
                              uniform_size=ugs)
        qn = layer_norm(queries, g_q, b_q)

        attn = AttentionSparse(d, self.heads, self.dim_head, name="attn1")
        induced = attn.queries_to_nodes(qn, xn, batch, num_graphs,
                                        node_mask=node_mask,
                                        axis_name=self.axis_name)
        attn2 = AttentionSparse(d, self.heads, self.dim_head, name="attn2")
        out = attn2.nodes_to_queries(xn, induced, batch)

        x = out + res_x
        queries = induced + res_queries

        g_ff = self.param("ff_norm_gamma", inits.ones_init, (d,))
        b_ff = self.param("ff_norm_beta", inits.zeros_init, (d,))
        w1 = self.param("ff_w1", inits.torch_linear_weight_init, (d, d * 4))
        b1 = self.param("ff_b1", inits.torch_linear_bias_init(d), (d * 4,))
        w2 = self.param("ff_w2", inits.torch_linear_weight_init, (d * 4, d))
        b2 = self.param("ff_b2", inits.torch_linear_bias_init(d * 4), (d,))

        x_norm = graph_layer_norm(x, batch, num_graphs, g_ff, b_ff,
                                  node_mask=node_mask, axis_name=self.axis_name,
                                  uniform_size=ugs)
        x = jax.nn.gelu(x_norm @ w1 + b1, approximate=False) @ w2 + b2 + x_norm
        return x, queries


class EGNNSparseNetwork(nn.Module):
    """Stack of EGNNSparse layers with list-driven categorical embeddings,
    optional per-graph global attention, and a dynamic-edge ``recalc`` hook
    (capability parity with EGNN_Sparse_Network,
    egnn_pytorch_geometric.py:274-439).

    ``recalc_edge`` is the caller-supplied dynamic-graph hook: every ``recalc``
    layers it re-derives ``(edge_index, edge_attr, edge_mask)`` from the
    current ``x`` (reference :432-434 returns a 3-tuple too). On TPU it must
    return static shapes — use egnn_tpu.ops.graph.knn_graph/radius_graph.
    """

    n_layers: int
    feats_dim: int
    pos_dim: int = 3
    edge_attr_dim: int = 0
    m_dim: int = 16
    fourier_features: int = 0
    soft_edge: int = 0
    embedding_nums: Sequence[int] = ()
    embedding_dims: Sequence[int] = ()
    edge_embedding_nums: Sequence[int] = ()
    edge_embedding_dims: Sequence[int] = ()
    update_coors: bool = True
    update_feats: bool = True
    norm_feats: bool = True
    norm_coors: bool = False
    norm_coors_scale_init: float = 1e-2
    dropout: float = 0.0
    coor_weights_clamp_value: Optional[float] = None
    aggr: str = "add"
    global_linear_attn_every: int = 0
    global_linear_attn_heads: int = 8
    global_linear_attn_dim_head: int = 64
    num_global_tokens: int = 4
    recalc: int = 0
    # Edge-partitioned multi-device layout (see EGNNSparse.shard_axis and
    # parallel/sparse_partition.py). Global attention works sharded too: its
    # segment-softmax statistics, induced-token aggregation and per-graph
    # LayerNorm stats psum over this axis (round-2 item 6).
    shard_axis: Optional[str] = None
    # Static receiver degree of a receiver-major edge layout (see
    # EGNNSparse.uniform_degree): scatter-free aggregation for kNN-built
    # graphs. A recalc_edge hook must preserve the layout (knn_graph does).
    uniform_degree: Optional[int] = None
    # Per-layer passthroughs (see the EGNNSparse fields of the same name):
    # mixed-precision message path, and the fused uniform-degree Pallas
    # pipeline (None currently resolves to OFF — opt-in pending the
    # on-chip A/B, matching the EGNNSparse field docstring).
    compute_dtype: Any = None
    fused_uniform: Optional[bool] = None
    # Static per-graph node count of a contiguous batch layout (see
    # EGNNSparse.uniform_graph_size): block-local MXU gathers + reshape
    # LayerNorm statistics for equal-size batched graphs.
    uniform_graph_size: Optional[int] = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        edge_index: jnp.ndarray,
        batch: Optional[jnp.ndarray] = None,
        edge_attr: Optional[jnp.ndarray] = None,
        edge_mask: Optional[jnp.ndarray] = None,
        num_graphs: int = 1,
        node_mask: Optional[jnp.ndarray] = None,
        recalc_edge: Optional[Callable] = None,
        deterministic: bool = True,
        bsize: Optional[int] = None,
    ) -> jnp.ndarray:
        # ``bsize`` mirrors the reference's vestigial forward kwarg
        # (egnn_pytorch_geometric.py:395,423 — PyG propagate's ``size`` hint).
        # Shapes are static here, so it is accepted for signature parity and
        # validated only.
        if bsize is not None and bsize != x.shape[0]:
            raise ValueError(
                f"bsize={bsize} disagrees with the static node count "
                f"{x.shape[0]}; static-capacity batches size via padding")
        # Embedding-adjusted dims: each categorical column is replaced by its
        # embedding (feats_dim += emb_dim - 1 per table,
        # egnn_pytorch_geometric.py:334-342).
        feats_dim = self.feats_dim + sum(d - 1 for d in self.embedding_dims)
        edge_attr_dim = self.edge_attr_dim + sum(d - 1 for d in self.edge_embedding_dims)

        emb_tables = [
            self.param(f"emb_{i}", inits.unit_normal_init, (num, dim))
            for i, (num, dim) in enumerate(zip(self.embedding_nums, self.embedding_dims))
        ]
        edge_emb_tables = [
            self.param(f"edge_emb_{i}", inits.unit_normal_init, (num, dim))
            for i, (num, dim) in enumerate(
                zip(self.edge_embedding_nums, self.edge_embedding_dims)
            )
        ]

        has_global_attn = self.global_linear_attn_every > 0
        if has_global_attn:
            tokens = self.param(
                "global_tokens", inits.unit_normal_init,
                (self.num_global_tokens, feats_dim),
            )
            global_tokens = jnp.broadcast_to(tokens, (num_graphs,) + tokens.shape)
        if batch is None:
            batch_ids = jnp.zeros((x.shape[0],), dtype=jnp.int32)
        else:
            batch_ids = batch

        # node categorical columns -> embeddings (once, egnn_pytorch_geometric.py:402)
        x_coors = x[:, : self.pos_dim]
        x_feats = embed_tokens(x[:, self.pos_dim :], list(self.embedding_dims), emb_tables)
        x = jnp.concatenate([x_coors, x_feats], axis=-1)

        edges_need_embedding = True
        for i in range(self.n_layers):
            if edges_need_embedding and edge_attr is not None:
                edge_attr = embed_tokens(
                    edge_attr, list(self.edge_embedding_dims), edge_emb_tables
                )
                edges_need_embedding = False

            is_global_layer = has_global_attn and (i % self.global_linear_attn_every) == 0
            if is_global_layer:
                feats_part = x[:, self.pos_dim :]
                feats_part, global_tokens = GlobalLinearAttentionSparse(
                    dim=feats_dim,
                    heads=self.global_linear_attn_heads,
                    dim_head=self.global_linear_attn_dim_head,
                    axis_name=self.shard_axis,
                    uniform_graph_size=self.uniform_graph_size,
                    name=f"global_attn_{i}",
                )(feats_part, global_tokens, batch_ids, num_graphs,
                  node_mask=node_mask)
                x = jnp.concatenate([x[:, : self.pos_dim], feats_part], axis=-1)

            x = EGNNSparse(
                feats_dim=feats_dim,
                pos_dim=self.pos_dim,
                edge_attr_dim=edge_attr_dim,
                m_dim=self.m_dim,
                fourier_features=self.fourier_features,
                soft_edge=self.soft_edge,
                norm_feats=self.norm_feats,
                norm_coors=self.norm_coors,
                norm_coors_scale_init=self.norm_coors_scale_init,
                update_feats=self.update_feats,
                update_coors=self.update_coors,
                dropout=self.dropout,
                coor_weights_clamp_value=self.coor_weights_clamp_value,
                aggr=self.aggr,
                shard_axis=self.shard_axis,
                uniform_degree=self.uniform_degree,
                compute_dtype=self.compute_dtype,
                fused_uniform=self.fused_uniform,
                uniform_graph_size=self.uniform_graph_size,
                name=f"mpnn_{i}",
            )(
                x,
                edge_index,
                edge_attr=edge_attr,
                batch=batch,
                edge_mask=edge_mask,
                num_graphs=num_graphs,
                node_mask=node_mask,
                deterministic=deterministic,
            )

            if (
                self.recalc
                and recalc_edge is not None
                and (i % self.recalc == 0)
                and i != self.n_layers - 1
            ):
                edge_index, edge_attr, edge_mask = recalc_edge(x)
                edges_need_embedding = True

        return x
