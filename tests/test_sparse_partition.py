"""Edge-partitioned sparse path vs the unsharded layer (8-virtual-device CPU
mesh): the shard_map apply with receiver-owned edges, global-sender
all-gather, and psum'd graph-LayerNorm stats must reproduce the single-device
EGNNSparse output exactly (up to summation order)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from egnn_tpu import EGNNSparse
from egnn_tpu.ops.graph import knn_graph
from egnn_tpu.parallel import make_mesh
from egnn_tpu.parallel.sparse_partition import partition_edges


def _graph_case(seed, n=64, d=6, k=4, num_graphs=2):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    coors = jax.random.normal(ks[0], (n, 3))
    feats = jax.random.normal(ks[1], (n, d))
    x = jnp.concatenate([coors, feats], axis=-1)
    batch = jnp.repeat(jnp.arange(num_graphs, dtype=jnp.int32), n // num_graphs)
    # kNN within each graph via masking is overkill here; use global kNN and
    # just verify numerics parity (the layer doesn't care about graph
    # boundaries except in LayerNorm).
    es = knn_graph(coors, k)
    edge_attr = jax.random.normal(ks[2], (es.senders.shape[0], 2))
    return x, batch, es, edge_attr


@pytest.mark.parametrize("norm_feats", [False, True])
@pytest.mark.parametrize("aggr", ["add", "mean"])
def test_partitioned_matches_unsharded(norm_feats, aggr):
    shards, num_graphs = 8, 2
    n, d = 64, 6
    x, batch, es, edge_attr = _graph_case(0, n=n, d=d, num_graphs=num_graphs)

    layer = EGNNSparse(feats_dim=d, edge_attr_dim=2, fourier_features=2,
                       norm_feats=norm_feats, norm_coors=True, aggr=aggr)
    params = layer.init(
        jax.random.PRNGKey(1), x, es.edge_index, edge_attr=edge_attr,
        batch=batch, edge_mask=es.mask, num_graphs=num_graphs,
    )
    ref_fn = jax.jit(
        lambda p, xx, ei, ea, bi, m: layer.apply(
            p, xx, ei, edge_attr=ea, batch=bi, edge_mask=m,
            num_graphs=num_graphs,
        )
    )
    ref = ref_fn(params, x, es.edge_index, edge_attr, batch, es.mask)

    pe = partition_edges(
        es.senders, es.receivers, n, shards, edge_attr=edge_attr,
        edge_mask=es.mask,
    )
    sharded_layer = EGNNSparse(feats_dim=d, edge_attr_dim=2,
                               fourier_features=2, norm_feats=norm_feats,
                               norm_coors=True, aggr=aggr,
                               shard_axis="graph")
    mesh = make_mesh(data=1, graph=shards)

    def apply_shard(p, x, snd, rcv, msk, ea, batch_ids):
        ei = jnp.stack([snd, rcv], axis=0)
        return sharded_layer.apply(
            p, x, ei, edge_attr=ea, batch=batch_ids, edge_mask=msk,
            num_graphs=num_graphs,
        )

    apply_shard = jax.shard_map(
        apply_shard, mesh=mesh,
        in_specs=(P(), P("graph"), P("graph"), P("graph"), P("graph"),
                  P("graph"), P("graph")),
        out_specs=P("graph"),
        check_vma=False,
    )
    out = jax.jit(apply_shard)(
        params, x, pe.senders, pe.receivers, pe.mask, pe.edge_attr, batch
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-9, atol=1e-9)


def test_partition_edges_layout():
    n, shards = 32, 4
    es = knn_graph(jax.random.normal(jax.random.PRNGKey(0), (n, 3)), 3)
    pe = partition_edges(es.senders, es.receivers, n, shards)
    nl = n // shards
    cap = pe.capacity
    snd = np.asarray(pe.senders).reshape(shards, cap)
    rcv = np.asarray(pe.receivers).reshape(shards, cap)
    msk = np.asarray(pe.mask).reshape(shards, cap)
    total = 0
    for s_ in range(shards):
        r = rcv[s_][msk[s_]]
        assert (r >= 0).all() and (r < nl).all()
        assert (np.diff(r) >= 0).all()  # stable pack keeps receiver-major
        total += msk[s_].sum()
    assert total == int(np.asarray(es.mask).sum())


def test_partitioned_network_matches_unsharded():
    shards, num_graphs, n, d = 8, 2, 64, 6
    x, batch, es, edge_attr = _graph_case(3, n=n, d=d, num_graphs=num_graphs)
    common = dict(n_layers=3, feats_dim=d, edge_attr_dim=2,
                  fourier_features=2, norm_feats=True, norm_coors=True)
    from egnn_tpu import EGNNSparseNetwork

    net = EGNNSparseNetwork(**common)
    params = net.init(jax.random.PRNGKey(1), x, es.edge_index,
                      edge_attr=edge_attr, batch=batch, edge_mask=es.mask,
                      num_graphs=num_graphs)
    ref = jax.jit(lambda p, xx: net.apply(
        p, xx, es.edge_index, edge_attr=edge_attr, batch=batch,
        edge_mask=es.mask, num_graphs=num_graphs))(params, x)

    pe = partition_edges(es.senders, es.receivers, n, shards,
                         edge_attr=edge_attr, edge_mask=es.mask)
    net_s = EGNNSparseNetwork(**common, shard_axis="graph")
    mesh = make_mesh(data=1, graph=shards)

    def ap(p, xx, snd, rcv, msk, ea, bi):
        return net_s.apply(p, xx, jnp.stack([snd, rcv]), edge_attr=ea,
                           batch=bi, edge_mask=msk, num_graphs=num_graphs)

    ap = jax.shard_map(
        ap, mesh=mesh,
        in_specs=(P(), P("graph"), P("graph"), P("graph"), P("graph"),
                  P("graph"), P("graph")),
        out_specs=P("graph"), check_vma=False,
    )
    out = jax.jit(ap)(params, x, pe.senders, pe.receivers, pe.mask,
                      pe.edge_attr, batch)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-9, atol=1e-9)


def test_partitioned_train_step_matches_unsharded():
    """make_partitioned_sparse_train_step: one optimizer step on the 8-shard
    mesh must produce the same loss and updated params as an unsharded
    single-device step with the identical denoising objective."""
    from egnn_tpu import EGNNSparseNetwork
    from egnn_tpu.training import (
        TrainState, make_adam, make_partitioned_sparse_train_step)

    shards, num_graphs, n, d = 8, 2, 64, 6
    x, batch, es, edge_attr = _graph_case(11, n=n, d=d, num_graphs=num_graphs)
    clean = x[:, :3] + 0.05 * jax.random.normal(jax.random.PRNGKey(12), (n, 3))
    nmsk = jnp.arange(n) < (n - 5)  # some padding nodes
    common = dict(n_layers=2, feats_dim=d, edge_attr_dim=2,
                  fourier_features=2, norm_feats=True, norm_coors=True)

    net = EGNNSparseNetwork(**common)
    params = net.init(jax.random.PRNGKey(1), x, es.edge_index,
                      edge_attr=edge_attr, batch=batch, edge_mask=es.mask,
                      num_graphs=num_graphs)["params"]

    # unsharded reference step
    def ref_loss(p):
        out = net.apply({"params": p}, x, es.edge_index, edge_attr=edge_attr,
                        batch=batch, edge_mask=es.mask, num_graphs=num_graphs,
                        node_mask=nmsk)
        err = (out[:, :3] - clean) ** 2 * nmsk[:, None]
        return err.sum() / (nmsk.sum() * 3.0)

    ref_l, ref_g = jax.jit(jax.value_and_grad(ref_loss))(params)
    ref_state = TrainState.create(params, make_adam(1e-3)).apply_gradients(ref_g)

    # sharded step
    mesh = make_mesh(data=1, graph=shards)
    pe = partition_edges(es.senders, es.receivers, n, shards,
                         edge_attr=edge_attr, edge_mask=es.mask)
    net_s = EGNNSparseNetwork(**common, shard_axis="graph")
    step = make_partitioned_sparse_train_step(net_s, mesh,
                                              num_graphs=num_graphs)
    sp = lambda a: jax.device_put(a, NamedSharding(mesh, P("graph")))
    state = jax.device_put(TrainState.create(params, make_adam(1e-3)),
                           NamedSharding(mesh, P()))
    state, loss = step(state, sp(x), sp(pe.senders), sp(pe.receivers),
                       sp(pe.mask), sp(pe.edge_attr), sp(batch), sp(clean),
                       sp(nmsk))

    np.testing.assert_allclose(float(loss), float(ref_l), rtol=1e-9)
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(ref_state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-8, atol=1e-10)


def test_partitioned_uniform_degree_matches_unsharded():
    """shard_axis + uniform_degree via partition_uniform_edges (pure-slice
    sharding of a kNN layout): scatter-free aggregation on every shard must
    reproduce the single-device output exactly."""
    from egnn_tpu.parallel import partition_uniform_edges

    shards, n, d, k = 8, 64, 6, 4
    x, batch, es, edge_attr = _graph_case(5, n=n, d=d, k=k)
    common = dict(feats_dim=d, edge_attr_dim=2, fourier_features=2,
                  norm_feats=True, norm_coors=True)
    layer = EGNNSparse(**common)
    params = layer.init(jax.random.PRNGKey(2), x, es.edge_index,
                        edge_attr=edge_attr, batch=batch, edge_mask=es.mask)
    ref = jax.jit(lambda p, xx: layer.apply(
        p, xx, es.edge_index, edge_attr=edge_attr, batch=batch,
        edge_mask=es.mask, num_graphs=2))(params, x)

    pe = partition_uniform_edges(es.senders, n, shards, k,
                                 edge_attr=edge_attr, edge_mask=es.mask)
    assert pe.capacity == (n // shards) * k
    layer_s = EGNNSparse(**common, shard_axis="graph", uniform_degree=k)
    mesh = make_mesh(data=1, graph=shards)

    def ap(p, xx, snd, rcv, msk, ea, bi):
        return layer_s.apply(p, xx, jnp.stack([snd, rcv]), edge_attr=ea,
                             batch=bi, edge_mask=msk, num_graphs=2)

    ap = jax.shard_map(
        ap, mesh=mesh,
        in_specs=(P(), P("graph"), P("graph"), P("graph"), P("graph"),
                  P("graph"), P("graph")),
        out_specs=P("graph"), check_vma=False,
    )
    out = jax.jit(ap)(params, x, pe.senders, pe.receivers, pe.mask,
                      pe.edge_attr, batch)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-9, atol=1e-9)


def test_sharded_global_attention_matches_unsharded():
    """Round-2 item 6: EGNNSparseNetwork with global_linear_attn_every>0 now
    works under shard_axis — the segment-softmax/induced-token/LayerNorm
    statistics psum over the mesh axis and must reproduce the unsharded
    network (up to summation order)."""
    from egnn_tpu import EGNNSparseNetwork

    shards, num_graphs = 8, 2
    n, d = 64, 6
    x, batch, es, edge_attr = _graph_case(3, n=n, d=d, num_graphs=num_graphs)
    node_mask = jax.random.uniform(jax.random.PRNGKey(9), (n,)) > 0.2

    common = dict(n_layers=2, feats_dim=d, edge_attr_dim=2,
                  fourier_features=2, norm_feats=True, norm_coors=True,
                  global_linear_attn_every=1, global_linear_attn_heads=2,
                  global_linear_attn_dim_head=8, num_global_tokens=3)
    net = EGNNSparseNetwork(**common)
    params = net.init(
        jax.random.PRNGKey(1), x, es.edge_index, batch=batch,
        edge_attr=edge_attr, edge_mask=es.mask, num_graphs=num_graphs,
        node_mask=node_mask,
    )
    ref = jax.jit(lambda p: net.apply(
        p, x, es.edge_index, batch=batch, edge_attr=edge_attr,
        edge_mask=es.mask, num_graphs=num_graphs, node_mask=node_mask,
    ))(params)

    pe = partition_edges(es.senders, es.receivers, n, shards,
                         edge_attr=edge_attr, edge_mask=es.mask)
    sharded = EGNNSparseNetwork(shard_axis="graph", **common)
    mesh = make_mesh(data=1, graph=shards)

    def apply_shard(p, xx, snd, rcv, msk, ea, bi, nm):
        ei = jnp.stack([snd, rcv], axis=0)
        return sharded.apply(
            p, xx, ei, batch=bi, edge_attr=ea, edge_mask=msk,
            num_graphs=num_graphs, node_mask=nm,
        )

    apply_shard = jax.shard_map(
        apply_shard, mesh=mesh,
        in_specs=(P(), P("graph"), P("graph"), P("graph"), P("graph"),
                  P("graph"), P("graph"), P("graph")),
        out_specs=P("graph"),
        check_vma=False,
    )
    out = jax.jit(apply_shard)(
        params, x, pe.senders, pe.receivers, pe.mask, pe.edge_attr, batch,
        node_mask,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-8, atol=1e-8)
