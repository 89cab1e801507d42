"""Sparse/COO path tests: the reference's two sparse tests
(tests/test_equivariance.py:105-159) plus coverage the reference lacks —
aggregation options, padded-edge invariance, multi-graph batches, global
attention, network embeddings, and the dynamic-edge recalc hook."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from egnn_tpu import EGNNSparse, EGNNSparseNetwork
from egnn_tpu.ops.graph import knn_graph
from egnn_tpu.utils import rot

ATOL = 1e-6


def _apply_action(t, R, T):
    return (t @ R + T.reshape(1, 3))


def test_egnn_sparse_equivariance():
    """Mirror of the reference sparse equivariance test: feats_dim=1,
    fourier=4, random 20-edge COO graph over 16 nodes."""
    key = jax.random.PRNGKey(0)
    keys = jax.random.split(key, 6)
    layer = EGNNSparse(feats_dim=1, m_dim=16, fourier_features=4)

    R = rot(*jax.random.uniform(keys[0], (3,)))
    T = jax.random.normal(keys[1], (1, 3))

    feats = jax.random.normal(keys[2], (16, 1))
    coors = jax.random.normal(keys[3], (16, 3))
    edge_idxs = (jax.random.uniform(keys[4], (2, 20)) * 16).astype(jnp.int32)

    feats_perm = feats.at[0].set(feats[1]).at[1].set(feats[0])

    x1 = jnp.concatenate([coors, feats], axis=-1)
    x2 = jnp.concatenate([_apply_action(coors, R, T), feats], axis=-1)
    x3 = jnp.concatenate([_apply_action(coors, R, T), feats_perm], axis=-1)

    params = jax.jit(layer.init)(keys[5], x1, edge_idxs)
    apply = jax.jit(layer.apply)
    out1 = apply(params, x1, edge_idxs)
    out2 = apply(params, x2, edge_idxs)
    out3 = apply(params, x3, edge_idxs)

    feats1, coors1 = out1[:, 3:], out1[:, :3]
    feats2, coors2 = out2[:, 3:], out2[:, :3]
    feats3 = out3[:, 3:]

    np.testing.assert_allclose(feats1, feats2, atol=ATOL, err_msg="features must be invariant")
    np.testing.assert_allclose(
        _apply_action(coors1, R, T), coors2, atol=ATOL,
        err_msg="coordinates must be equivariant",
    )
    assert not np.allclose(feats1, feats3, atol=ATOL)


def test_geom_equivalence():
    """Shape contract: output shape == input shape (reference :146-159)."""
    key = jax.random.PRNGKey(1)
    keys = jax.random.split(key, 5)
    layer = EGNNSparse(feats_dim=128, edge_attr_dim=4, m_dim=16, fourier_features=4)

    feats = jax.random.normal(keys[0], (16, 128))
    coors = jax.random.normal(keys[1], (16, 3))
    x = jnp.concatenate([coors, feats], axis=-1)
    edge_idxs = (jax.random.uniform(keys[2], (2, 20)) * 16).astype(jnp.int32)
    dense_attrs = jax.random.normal(keys[3], (16, 16, 4))
    edge_attr = dense_attrs[edge_idxs[0], edge_idxs[1]]

    params = jax.jit(layer.init)(keys[4], x, edge_idxs, edge_attr)
    out = jax.jit(layer.apply)(params, x, edge_idxs, edge_attr)
    assert out.shape == x.shape


@pytest.mark.parametrize("aggr", ["add", "mean", "max"])
def test_sparse_aggregation_options(aggr):
    key = jax.random.PRNGKey(2)
    keys = jax.random.split(key, 5)
    layer = EGNNSparse(feats_dim=8, aggr=aggr, norm_feats=True, norm_coors=True)
    feats = jax.random.normal(keys[0], (12, 8))
    coors = jax.random.normal(keys[1], (12, 3))
    x = jnp.concatenate([coors, feats], axis=-1)
    edge_idxs = (jax.random.uniform(keys[2], (2, 30)) * 12).astype(jnp.int32)

    R = rot(*jax.random.uniform(keys[3], (3,)))
    T = jax.random.normal(keys[3], (1, 3))
    x_rot = jnp.concatenate([_apply_action(coors, R, T), feats], axis=-1)

    params = jax.jit(layer.init)(keys[4], x, edge_idxs)
    apply = jax.jit(layer.apply)
    out1 = apply(params, x, edge_idxs)
    out2 = apply(params, x_rot, edge_idxs)
    np.testing.assert_allclose(out1[:, 3:], out2[:, 3:], atol=ATOL)
    if aggr != "max":
        # componentwise max over w_ij*rel_coors is not rotation-equivariant
        # (same in the reference, which max-pools the coordinate messages too —
        # egnn_pytorch_geometric.py:248); only sum/mean preserve equivariance.
        np.testing.assert_allclose(_apply_action(out1[:, :3], R, T), out2[:, :3], atol=ATOL)


@pytest.mark.parametrize("aggr", ["add", "mean", "max"])
def test_padded_edges_are_inert(aggr):
    """Core TPU contract: growing edge capacity with masked padding must not
    change any output."""
    key = jax.random.PRNGKey(3)
    keys = jax.random.split(key, 4)
    layer = EGNNSparse(feats_dim=8, aggr=aggr, soft_edge=1)
    feats = jax.random.normal(keys[0], (10, 8))
    coors = jax.random.normal(keys[1], (10, 3))
    x = jnp.concatenate([coors, feats], axis=-1)
    E = 24
    edge_idxs = (jax.random.uniform(keys[2], (2, E)) * 10).astype(jnp.int32)
    mask_all = jnp.ones((E,), dtype=bool)

    params = jax.jit(layer.init)(keys[3], x, edge_idxs)
    apply = jax.jit(layer.apply)
    out_ref = apply(params, x, edge_idxs, None, None, mask_all)

    # pad with 8 junk edges, masked out
    junk = (jax.random.uniform(keys[2], (2, 8)) * 10).astype(jnp.int32)
    padded_idx = jnp.concatenate([edge_idxs, junk], axis=1)
    padded_mask = jnp.concatenate([mask_all, jnp.zeros((8,), bool)])
    out_pad = apply(params, x, padded_idx, None, None, padded_mask)
    np.testing.assert_allclose(out_ref, out_pad, atol=1e-12)


def test_sparse_clamp_honored():
    """Fix-forward divergence: coor_weights_clamp_value works on the sparse
    path (the reference silently discards it)."""
    key = jax.random.PRNGKey(4)
    keys = jax.random.split(key, 4)
    l_clamped = EGNNSparse(feats_dim=4, coor_weights_clamp_value=1e-6)
    l_free = EGNNSparse(feats_dim=4)
    feats = jax.random.normal(keys[0], (8, 4))
    coors = 10.0 * jax.random.normal(keys[1], (8, 3))
    x = jnp.concatenate([coors, feats], axis=-1)
    edge_idxs = (jax.random.uniform(keys[2], (2, 16)) * 8).astype(jnp.int32)

    params = jax.jit(l_free.init)(keys[3], x, edge_idxs)
    out_free = jax.jit(l_free.apply)(params, x, edge_idxs)
    out_clamped = jax.jit(l_clamped.apply)(params, x, edge_idxs)
    # clamped coordinate update must be (near) frozen; features unchanged
    np.testing.assert_allclose(out_clamped[:, :3], coors, atol=1e-4)
    np.testing.assert_allclose(out_clamped[:, 3:], out_free[:, 3:], atol=1e-12)


def test_sparse_network_with_embeddings_and_recalc():
    """EGNN_Sparse_Network capability: categorical embeddings for node/edge
    features, multi-graph batch, dynamic-edge recalc via knn_graph."""
    key = jax.random.PRNGKey(5)
    keys = jax.random.split(key, 6)
    n, k = 20, 4
    net = EGNNSparseNetwork(
        n_layers=3,
        feats_dim=5,  # 4 continuous + 1 categorical column
        embedding_nums=[7],
        embedding_dims=[6],
        edge_attr_dim=1,  # 1 categorical edge column
        edge_embedding_nums=[5],
        edge_embedding_dims=[3],
        m_dim=8,
        norm_feats=True,
        recalc=2,
    )
    coors = jax.random.normal(keys[0], (n, 3))
    cont = jax.random.normal(keys[1], (n, 4))
    cat = jax.random.randint(keys[2], (n, 1), 0, 7).astype(cont.dtype)
    x = jnp.concatenate([coors, cont, cat], axis=-1)
    batch = jnp.concatenate([jnp.zeros(10, jnp.int32), jnp.ones(10, jnp.int32)])

    es = knn_graph(coors, k)
    edge_attr = jax.random.randint(keys[3], (es.senders.shape[0], 1), 0, 5).astype(cont.dtype)

    def recalc_edge(x_now):
        es2 = knn_graph(x_now[:, :3], k)
        ea = jnp.zeros((es2.senders.shape[0], 1), x_now.dtype)
        return es2.edge_index, ea, es2.mask

    params = net.init(
        keys[4], x, es.edge_index, batch, edge_attr, es.mask,
        num_graphs=2, recalc_edge=recalc_edge,
    )
    out = net.apply(
        params, x, es.edge_index, batch, edge_attr, es.mask,
        num_graphs=2, recalc_edge=recalc_edge,
    )
    assert out.shape == (n, 3 + 4 + 6)  # feats: 4 cont + 6 emb
    assert jnp.all(jnp.isfinite(out))


def test_sparse_network_global_attention_equivariance():
    """Fixed global-attention interleave: runs, and stays equivariant."""
    key = jax.random.PRNGKey(6)
    keys = jax.random.split(key, 6)
    n = 14
    net = EGNNSparseNetwork(
        n_layers=2,
        feats_dim=8,
        m_dim=8,
        global_linear_attn_every=1,
        global_linear_attn_heads=2,
        global_linear_attn_dim_head=4,
        num_global_tokens=3,
    )
    coors = jax.random.normal(keys[0], (n, 3))
    feats = jax.random.normal(keys[1], (n, 8))
    x = jnp.concatenate([coors, feats], axis=-1)
    batch = jnp.concatenate([jnp.zeros(8, jnp.int32), jnp.ones(6, jnp.int32)])
    es = knn_graph(coors, 3)

    R = rot(*jax.random.uniform(keys[2], (3,)))
    T = jax.random.normal(keys[3], (1, 3))
    x_rot = jnp.concatenate([_apply_action(coors, R, T), feats], axis=-1)

    init = jax.jit(net.init, static_argnames=("num_graphs",))
    apply = jax.jit(net.apply, static_argnames=("num_graphs",))
    params = init(keys[4], x, es.edge_index, batch, None, es.mask, num_graphs=2)
    out1 = apply(params, x, es.edge_index, batch, None, es.mask, num_graphs=2)
    out2 = apply(params, x_rot, es.edge_index, batch, None, es.mask, num_graphs=2)

    np.testing.assert_allclose(out1[:, 3:], out2[:, 3:], atol=ATOL)
    np.testing.assert_allclose(_apply_action(out1[:, :3], R, T), out2[:, :3], atol=ATOL)


def test_knn_graph_masked():
    """knn_graph respects node masks and never links invalid nodes."""
    key = jax.random.PRNGKey(7)
    coors = jax.random.normal(key, (12, 3))
    node_mask = jnp.arange(12) < 9
    es = knn_graph(coors, 4, node_mask=node_mask)
    # no valid edge touches an invalid node
    touch_invalid = (~node_mask[es.senders] | ~node_mask[es.receivers]) & es.mask
    assert not bool(touch_invalid.any())
    # invalid receivers have zero valid edges
    per_node = jax.ops.segment_sum(es.mask.astype(jnp.int32), es.receivers, num_segments=12)
    assert bool((per_node[9:] == 0).all())
    assert bool((per_node[:9] == 4).all())


class TestUniformDegree:
    """uniform_degree: scatter-free aggregation for receiver-major
    uniform-k layouts (every kNN builder's output). Must be bit-identical to
    the general segment path — outputs AND gradients, all aggr modes."""

    def _case(self):
        key = jax.random.PRNGKey(1)
        coors = jax.random.normal(key, (24, 3))
        feats = jax.random.normal(jax.random.PRNGKey(2), (24, 6))
        x = jnp.concatenate([coors, feats], -1)
        nm = jnp.arange(24) < 20
        es = knn_graph(coors, 4, node_mask=nm)
        return x, es

    @pytest.mark.parametrize("aggr", ["add", "sum", "mean", "max"])
    def test_uniform_aggregate_matches_segment(self, aggr):
        from egnn_tpu.ops.segment import segment_aggregate, uniform_aggregate

        rng = np.random.RandomState(0)
        n, k, w = 20, 4, 5
        data = jnp.asarray(rng.randn(n * k, w))
        ids = jnp.repeat(jnp.arange(n), k)
        mask = jnp.asarray(rng.rand(n * k) > 0.3)
        for m in (None, mask):
            a = segment_aggregate(aggr, data, ids, n, mask=m)
            b = uniform_aggregate(aggr, data, k, mask=m)
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-12)

    @pytest.mark.parametrize("aggr", ["add", "mean", "max"])
    def test_layer_outputs_and_grads_match(self, aggr):
        x, es = self._case()
        kw = dict(feats_dim=6, fourier_features=2, norm_feats=True,
                  norm_coors=True, aggr=aggr)
        l0 = EGNNSparse(**kw)
        l1 = EGNNSparse(**kw, uniform_degree=4)
        p = l0.init(jax.random.PRNGKey(0), x, es.edge_index, edge_mask=es.mask)
        o0 = l0.apply(p, x, es.edge_index, edge_mask=es.mask)
        o1 = l1.apply(p, x, es.edge_index, edge_mask=es.mask)
        np.testing.assert_allclose(np.asarray(o0), np.asarray(o1), atol=1e-12)
        g0 = jax.grad(lambda pp: jnp.sum(
            l0.apply(pp, x, es.edge_index, edge_mask=es.mask) ** 2))(p)
        g1 = jax.grad(lambda pp: jnp.sum(
            l1.apply(pp, x, es.edge_index, edge_mask=es.mask) ** 2))(p)
        for a, b in zip(jax.tree_util.tree_leaves(g0),
                        jax.tree_util.tree_leaves(g1)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-12)

    def test_network_equivariance_with_uniform_degree(self):
        from egnn_tpu import EGNNSparseNetwork
        from egnn_tpu.utils import rot

        x, es = self._case()
        net = EGNNSparseNetwork(n_layers=2, feats_dim=6, fourier_features=2,
                                norm_feats=True, uniform_degree=4)
        p = net.init(jax.random.PRNGKey(0), x, es.edge_index,
                     edge_mask=es.mask)
        out = net.apply(p, x, es.edge_index, edge_mask=es.mask)
        R = rot(0.2, 0.8, 1.3)
        T = jnp.asarray([1.0, -2.0, 0.5])
        x2 = jnp.concatenate([x[:, :3] @ R + T, x[:, 3:]], -1)
        out2 = net.apply(p, x2, es.edge_index, edge_mask=es.mask)
        np.testing.assert_allclose(np.asarray(out2[:, 3:]),
                                   np.asarray(out[:, 3:]), atol=1e-9)
        np.testing.assert_allclose(np.asarray(out2[:, :3]),
                                   np.asarray(out[:, :3] @ R + T), atol=1e-9)

    def test_wrong_edge_count_asserts(self):
        x, es = self._case()
        layer = EGNNSparse(feats_dim=6, uniform_degree=5)
        with pytest.raises(AssertionError):
            layer.init(jax.random.PRNGKey(0), x, es.edge_index,
                       edge_mask=es.mask)


def test_node_mask_isolates_padding_from_layernorm():
    """With node_mask passed, mutating PADDED nodes' features must not change
    any valid node's output (graph-LayerNorm statistics would otherwise leak
    padding content into real nodes — the reference never pads, so this is a
    static-capacity-specific contract)."""
    n, d, k, valid_n = 24, 6, 4, 18
    key = jax.random.PRNGKey(3)
    coors = jax.random.normal(key, (n, 3))
    feats = jax.random.normal(jax.random.PRNGKey(4), (n, d))
    nm = jnp.arange(n) < valid_n
    x = jnp.concatenate([coors, feats], -1)
    es = knn_graph(coors, k, node_mask=nm)
    net = EGNNSparseNetwork(n_layers=2, feats_dim=d, fourier_features=2,
                            norm_feats=True)
    p = net.init(jax.random.PRNGKey(0), x, es.edge_index, edge_mask=es.mask,
                 node_mask=nm)
    out1 = net.apply(p, x, es.edge_index, edge_mask=es.mask, node_mask=nm)
    # scramble the padded tail's features AND coordinates
    x2 = x.at[valid_n:].set(100.0 * jax.random.normal(jax.random.PRNGKey(9),
                                                      (n - valid_n, 3 + d)))
    out2 = net.apply(p, x2, es.edge_index, edge_mask=es.mask, node_mask=nm)
    np.testing.assert_allclose(np.asarray(out2[:valid_n]),
                               np.asarray(out1[:valid_n]), atol=1e-12)
    # sanity: WITHOUT node_mask the padding leaks (documents why it exists)
    o1 = net.apply(p, x, es.edge_index, edge_mask=es.mask)
    o2 = net.apply(p, x2, es.edge_index, edge_mask=es.mask)
    assert np.abs(np.asarray(o2[:valid_n, 3:]) -
                  np.asarray(o1[:valid_n, 3:])).max() > 1e-6


def test_sparse_higher_dimension_coords():
    """pos_dim=5: E(n) for n != 3 on the sparse path (the dense analog is the
    reference's test_higher_dimension, tests/test_equivariance.py:36-45) —
    shape contract + equivariance under a 5-D rotation."""
    n, d, k, c = 20, 6, 4, 5
    key = jax.random.PRNGKey(0)
    coors = jax.random.normal(key, (n, c))
    feats = jax.random.normal(jax.random.PRNGKey(1), (n, d))
    x = jnp.concatenate([coors, feats], -1)
    es = knn_graph(coors, k)
    layer = EGNNSparse(feats_dim=d, pos_dim=c, fourier_features=2,
                       norm_feats=True)
    p = layer.init(jax.random.PRNGKey(2), x, es.edge_index, edge_mask=es.mask)
    out = layer.apply(p, x, es.edge_index, edge_mask=es.mask)
    assert out.shape == x.shape
    # random 5-D rotation via QR
    q, _ = jnp.linalg.qr(jax.random.normal(jax.random.PRNGKey(3), (c, c)))
    T = jax.random.normal(jax.random.PRNGKey(4), (c,))
    x2 = jnp.concatenate([coors @ q + T, feats], -1)
    out2 = layer.apply(p, x2, es.edge_index, edge_mask=es.mask)
    np.testing.assert_allclose(np.asarray(out2[:, c:]), np.asarray(out[:, c:]),
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(out2[:, :c]),
                               np.asarray(out[:, :c] @ q + T), atol=1e-9)


def _batched_uniform_setup(seed=0, G=4, NA=16, K=4, D=8, partial_masks=True):
    """Equal-size batched molecules with kNN edges: the uniform_graph_size
    layout (contiguous batch, receiver-major uniform-degree edges)."""
    key = jax.random.PRNGKey(seed)
    ks = jax.random.split(key, 4)
    N = G * NA
    coors = 2.0 * jax.random.normal(ks[0], (G, NA, 3))
    feats = jax.random.normal(ks[1], (N, D))
    if partial_masks:
        node_mask = jnp.arange(NA)[None, :] < jnp.asarray([NA, NA - 3, NA - 1, NA])[:, None]
    else:
        node_mask = jnp.ones((G, NA), bool)
    es = jax.vmap(lambda co, m: knn_graph(co, K, node_mask=m))(coors, node_mask)
    off = (jnp.arange(G, dtype=jnp.int32) * NA)[:, None]
    ei = jnp.stack([(es.senders + off).reshape(-1), (es.receivers + off).reshape(-1)])
    em = es.mask.reshape(-1)
    batch = jnp.repeat(jnp.arange(G, dtype=jnp.int32), NA)
    x = jnp.concatenate([coors.reshape(N, 3), feats], -1)
    return x, ei, em, batch, node_mask.reshape(-1), G, NA, K, D


def test_gather_rows_blocked_matches_gather():
    from egnn_tpu.ops.core import gather_rows_blocked

    key = jax.random.PRNGKey(3)
    G, R, C, EB = 5, 8, 7, 13
    vals = jax.random.normal(key, (G * R, C))
    local = jax.random.randint(jax.random.PRNGKey(4), (G, EB), 0, R)
    idx = (local + jnp.arange(G)[:, None] * R).reshape(-1).astype(jnp.int32)
    out = jax.jit(lambda v: gather_rows_blocked(v, idx, G, R))(vals)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(vals[idx]))

    # out-of-block indices gather zeros (documented padding behavior)
    idx_bad = idx.at[0].set(jnp.int32(G * R - 1))  # row 0 is block 0
    out_bad = jax.jit(lambda v: gather_rows_blocked(v, idx_bad, G, R))(vals)
    assert np.all(np.asarray(out_bad[0]) == 0.0)
    np.testing.assert_array_equal(np.asarray(out_bad[1:]), np.asarray(out[1:]))

    # gradient matches the plain-gather gradient (scatter-add transpose)
    g1 = jax.grad(lambda v: (gather_rows_blocked(v, idx, G, R) ** 3).sum())(vals)
    g2 = jax.grad(lambda v: (v[idx] ** 3).sum())(vals)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-6)


def test_graph_layer_norm_uniform_matches_general():
    from egnn_tpu.ops.segment import graph_layer_norm

    key = jax.random.PRNGKey(5)
    G, NA, D = 4, 16, 8
    x = jax.random.normal(key, (G * NA, D)) * 3.0 + 1.0
    batch = jnp.repeat(jnp.arange(G, dtype=jnp.int32), NA)
    gamma = jax.random.normal(jax.random.PRNGKey(6), (D,)) + 1.0
    beta = jax.random.normal(jax.random.PRNGKey(7), (D,))
    node_mask = jnp.arange(NA)[None, :].repeat(G, 0).reshape(-1) < (NA - 2)
    for nm in (None, node_mask):
        a = graph_layer_norm(x, batch, G, gamma, beta, node_mask=nm)
        b = graph_layer_norm(x, batch, G, gamma, beta, node_mask=nm,
                             uniform_size=NA)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


@pytest.mark.parametrize("partial_masks", [False, True])
def test_uniform_graph_size_matches_general_path(partial_masks):
    """The uniform_graph_size fast path (block-local MXU gather + reshape
    LayerNorm stats) is a pure layout specialization: outputs must match the
    general segment path on the same inputs."""
    x, ei, em, batch, nm, G, NA, K, D = _batched_uniform_setup(
        seed=1, partial_masks=partial_masks)
    kw = dict(feats_dim=D, fourier_features=2, norm_feats=True,
              norm_coors=True, soft_edge=1, uniform_degree=K)
    lay_g = EGNNSparse(**kw)
    lay_u = EGNNSparse(**kw, uniform_graph_size=NA)
    ap_g = jax.jit(lambda p, v: lay_g.apply(p, v, ei, batch=batch,
                                            edge_mask=em, num_graphs=G,
                                            node_mask=nm))
    ap_u = jax.jit(lambda p, v: lay_u.apply(p, v, ei, batch=batch,
                                            edge_mask=em, num_graphs=G,
                                            node_mask=nm))
    params = lay_g.init(jax.random.PRNGKey(9), x, ei, batch=batch,
                        edge_mask=em, num_graphs=G, node_mask=nm)
    a = ap_g(params, x)
    b = ap_u(params, x)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    # gradients agree too (the blocked gather's einsum transpose vs scatter)
    ga = jax.grad(lambda v: (ap_g(params, v)[:, 3:] ** 2).mean())(x)
    gb = jax.grad(lambda v: (ap_u(params, v)[:, 3:] ** 2).mean())(x)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gb), atol=1e-6)


def test_uniform_graph_size_network_equivariance():
    x, ei, em, batch, nm, G, NA, K, D = _batched_uniform_setup(seed=2)
    net = EGNNSparseNetwork(n_layers=2, feats_dim=D, fourier_features=2,
                            norm_feats=True, norm_coors=True,
                            uniform_degree=K, uniform_graph_size=NA)
    params = net.init(jax.random.PRNGKey(11), x, ei, batch=batch,
                      edge_mask=em, num_graphs=G, node_mask=nm)
    apply = jax.jit(lambda p, v: net.apply(p, v, ei, batch=batch,
                                           edge_mask=em, num_graphs=G,
                                           node_mask=nm))
    R = rot(0.3, 0.7, 1.1)
    T = jnp.asarray([[0.5, -1.0, 2.0]])
    x2 = jnp.concatenate([_apply_action(x[:, :3], R, T), x[:, 3:]], -1)
    o1 = apply(params, x)
    o2 = apply(params, x2)
    np.testing.assert_allclose(np.asarray(o1[:, 3:]), np.asarray(o2[:, 3:]),
                               atol=ATOL)
    np.testing.assert_allclose(
        np.asarray(_apply_action(o1[:, :3], R, T)), np.asarray(o2[:, :3]),
        atol=ATOL)
