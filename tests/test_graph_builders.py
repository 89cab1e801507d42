"""Device-side graph builders (ops/graph.py) vs a dense reference.

Round-2 rework: knn_graph/radius_graph_capped route through
ops/neighbors.knn_select (the Pallas kernels on TPU, jnp here), so the
builders no longer materialize (N, N) on the kernel path. These tests pin the
builder semantics against an independent dense construction: neighbor SETS,
ranking order, self-exclusion, masking, and the packed-batch graph_size
layout.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from egnn_tpu.ops.graph import EdgeSet, knn_graph, radius_graph_capped


def _dense_knn_reference(coors, k, node_mask=None, loop=False, batch=None):
    """Independent (N, N) construction mirroring the pre-rework builder."""
    n = coors.shape[0]
    rel = coors[:, None, :] - coors[None, :, :]
    dist = np.array(jnp.sum(rel * rel, axis=-1))
    big = 1e10
    if not loop:
        dist[np.eye(n, dtype=bool)] = big
    if node_mask is not None:
        nm = np.asarray(node_mask)
        dist[~nm[:, None] | ~nm[None, :]] = big
    if batch is not None:
        bt = np.asarray(batch)
        dist[bt[:, None] != bt[None, :]] = big
    idx = np.argsort(dist, axis=1, kind="stable")[:, :k]
    vals = np.take_along_axis(dist, idx, axis=1)
    valid = vals < big
    if node_mask is not None:
        valid &= np.asarray(node_mask)[:, None]
    return idx, vals, valid


def _edges_to_rowsets(es: EdgeSet, n, k):
    s = np.asarray(es.senders).reshape(n, k)
    m = np.asarray(es.mask).reshape(n, k)
    return [set(s[i][m[i]].tolist()) for i in range(n)]


@pytest.mark.parametrize("loop", [False, True])
@pytest.mark.parametrize("with_mask", [False, True])
def test_knn_graph_matches_dense_reference(loop, with_mask):
    rng = np.random.RandomState(0)
    n, k = 150, 6
    coors = jnp.asarray(rng.randn(n, 3).astype(np.float32) * 3)
    node_mask = jnp.asarray(rng.rand(n) > 0.2) if with_mask else None
    es = knn_graph(coors, k, node_mask=node_mask, loop=loop)
    ridx, rvals, rvalid = _dense_knn_reference(coors, k, node_mask, loop)
    got = _edges_to_rowsets(es, n, k)
    for i in range(n):
        want = set(ridx[i][rvalid[i]].tolist())
        assert got[i] == want, f"row {i}: {got[i]} != {want}"
    # receiver-major invariant
    r = np.asarray(es.receivers)
    assert (np.diff(np.where(np.asarray(es.mask), r, r)[np.asarray(es.mask)]) >= 0).all()


def test_knn_graph_duplicate_points_self_exclusion():
    """Duplicate coordinates create zero-distance ties; self must still be
    excluded and each row keeps k non-self neighbors."""
    base = np.random.RandomState(1).randn(32, 3).astype(np.float32)
    coors = jnp.asarray(np.tile(base, (5, 1)))  # every point 5x duplicated
    n, k = coors.shape[0], 4
    es = knn_graph(coors, k, loop=False)
    s = np.asarray(es.senders).reshape(n, k)
    m = np.asarray(es.mask).reshape(n, k)
    assert m.all()
    for i in range(n):
        assert i not in s[i].tolist()
        # the 4 nearest non-self are the other 4 duplicates (distance 0)
        assert set(s[i].tolist()) == {j for j in range(i % 32, n, 32) if j != i}


def test_knn_graph_graph_size_packed_batch():
    """graph_size packed layout == batch-vector jnp path (sets per row)."""
    rng = np.random.RandomState(2)
    g, m, k = 3, 50, 5
    n = g * m
    coors = jnp.asarray(rng.randn(n, 3).astype(np.float32))
    batch = jnp.repeat(jnp.arange(g), m)
    node_mask = jnp.asarray(rng.rand(n) > 0.15)
    es_batch = knn_graph(coors, k, node_mask=node_mask, batch=batch)
    es_packed = knn_graph(coors, k, node_mask=node_mask, batch=batch,
                          graph_size=m)
    got_b = _edges_to_rowsets(es_batch, n, k)
    got_p = _edges_to_rowsets(es_packed, n, k)
    for i in range(n):
        assert got_b[i] == got_p[i], f"row {i}"
    # no cross-graph edges
    s = np.asarray(es_packed.senders)
    r = np.asarray(es_packed.receivers)
    msk = np.asarray(es_packed.mask)
    bt = np.asarray(batch)
    assert (bt[s[msk]] == bt[r[msk]]).all()


@pytest.mark.parametrize("loop", [False, True])
def test_radius_graph_capped_semantics(loop):
    """Per-row cap semantics: every in-radius pair present when under the
    cap; over-cap rows keep the closest; nothing beyond the radius."""
    rng = np.random.RandomState(3)
    n, cap, radius = 128, 8, 1.2
    coors = jnp.asarray(rng.randn(n, 3).astype(np.float32))
    es = radius_graph_capped(coors, radius, max_num_neighbors=cap, loop=loop)
    s = np.asarray(es.senders).reshape(n, cap)
    msk = np.asarray(es.mask).reshape(n, cap)
    c = np.asarray(coors)
    d = ((c[:, None] - c[None, :]) ** 2).sum(-1)
    for i in range(n):
        inr = set(np.where(d[i] <= radius ** 2)[0].tolist())
        if not loop:
            inr.discard(i)
        got = set(s[i][msk[i]].tolist())
        if len(inr) <= cap:
            assert got == inr, f"row {i}"
        else:
            want = set(sorted(inr, key=lambda j: (d[i, j], j))[:cap])
            assert got == want, f"row {i}"


def test_knn_graph_segment_ready_for_sparse_layer():
    """The builder output feeds EGNNSparse unchanged (uniform degree,
    receiver-major)."""
    from egnn_tpu import EGNNSparse

    rng = np.random.RandomState(4)
    n, k, fd = 64, 6, 8
    coors = jnp.asarray(rng.randn(n, 3).astype(np.float32))
    feats = jnp.asarray(rng.randn(n, fd).astype(np.float32))
    es = knn_graph(coors, k)
    layer = EGNNSparse(feats_dim=fd)
    x = jnp.concatenate([coors, feats], axis=-1)
    params = layer.init(jax.random.PRNGKey(0), x, es.edge_index,
                        edge_mask=es.mask)
    out = layer.apply(params, x, es.edge_index, edge_mask=es.mask)
    assert out.shape == x.shape and bool(jnp.isfinite(out).all())


@pytest.mark.parametrize("use_graph_size", [False, True])
def test_knn_graph_no_self_loops_when_n_leq_k(use_graph_size):
    """Degenerate n <= k with loop=False: the builder must still exclude
    self (ADVICE r2) — output width shrinks to n-1 instead of including a
    self edge per row."""
    rng = np.random.RandomState(9)
    n, k = 6, 8
    if use_graph_size:
        coors = jnp.asarray(rng.randn(2 * n, 3).astype(np.float32))
        es = knn_graph(coors, k, loop=False, graph_size=n)
        ntot = 2 * n
    else:
        coors = jnp.asarray(rng.randn(n, 3).astype(np.float32))
        es = knn_graph(coors, k, loop=False)
        ntot = n
    kk = es.senders.shape[0] // ntot
    assert kk == n - 1
    s = np.asarray(es.senders).reshape(ntot, kk)
    m = np.asarray(es.mask).reshape(ntot, kk)
    assert m.all()
    for i in range(ntot):
        assert i not in s[i].tolist()
        g0 = (i // n) * n if use_graph_size else 0
        assert set(s[i].tolist()) == set(range(g0, g0 + n)) - {i}


@pytest.mark.parametrize("loop", [False, True])
@pytest.mark.parametrize("with_mask", [False, True])
def test_knn_graph_ragged_batch_bucketed(loop, with_mask):
    """Ragged (unequal graph sizes) batch vector: the bucketed kernel-layout
    path must reproduce the dense per-graph reference without ever building
    the (N, N) matrix (round-3 scale-trap fix)."""
    rng = np.random.RandomState(4)
    sizes = [37, 5, 64, 1, 23]
    n, k = sum(sizes), 6
    coors = jnp.asarray(rng.randn(n, 3).astype(np.float32) * 2)
    batch = jnp.asarray(np.repeat(np.arange(len(sizes)), sizes))
    node_mask = jnp.asarray(rng.rand(n) > 0.2) if with_mask else None
    es = knn_graph(coors, k, node_mask=node_mask, loop=loop, batch=batch)
    ridx, rvals, rvalid = _dense_knn_reference(coors, k, node_mask, loop, batch)
    kk = np.asarray(es.senders).size // n
    got = _edges_to_rowsets(es, n, kk)
    for i in range(n):
        want = set(ridx[i][rvalid[i]].tolist())
        # the builder's capacity can be narrower than k in tiny graphs; the
        # reference keeps exactly the valid same-graph neighbors
        assert got[i] == want, f"row {i}: {got[i]} != {want}"


def test_knn_graph_ragged_batch_under_jit_with_caps():
    """Traced batch + static caps: bucketed path under jit, identical result
    to the eager call."""
    rng = np.random.RandomState(5)
    sizes = [20, 33, 8]
    n, k = sum(sizes), 4
    coors = jnp.asarray(rng.randn(n, 3).astype(np.float32))
    batch = jnp.asarray(np.repeat(np.arange(len(sizes)), sizes))

    eager = knn_graph(coors, k, batch=batch)
    jitted = jax.jit(
        lambda c, b: knn_graph(c, k, batch=b, max_graph_size=33, max_graphs=3)
    )(coors, batch)
    np.testing.assert_array_equal(np.asarray(eager.senders), np.asarray(jitted.senders))
    np.testing.assert_array_equal(np.asarray(eager.mask), np.asarray(jitted.mask))


def test_knn_graph_traced_ragged_without_caps_raises_at_scale():
    n = 8193
    coors = jnp.zeros((n, 3), jnp.float32)
    batch = jnp.zeros((n,), jnp.int32)
    with pytest.raises(ValueError, match="max_graph_size"):
        jax.jit(lambda c, b: knn_graph(c, 4, batch=b))(coors, batch)


def test_knn_graph_unsorted_batch_raises():
    coors = jnp.zeros((4, 3), jnp.float32)
    batch = jnp.asarray([0, 1, 0, 1])
    with pytest.raises(ValueError, match="sorted"):
        knn_graph(coors, 2, batch=batch)


def test_radius_graph_large_n_guard():
    from egnn_tpu.ops.graph import radius_graph
    coors = jnp.zeros((8193, 3), jnp.float32)
    with pytest.raises(ValueError, match="radius_graph_capped"):
        radius_graph(coors, 1.0, max_edges=128)


def test_knn_graph_ragged_overflow_does_not_corrupt_real_nodes():
    """Explicit caps that undershoot: dropped overflow nodes must land in the
    sacrificial grid slot, NOT on top of the real node at position m_cap-1
    (round-3 review fix). The surviving nodes' edges must match the same
    graph truncated to m_cap nodes."""
    rng = np.random.RandomState(7)
    sizes = [6, 4]
    cap = 4   # graph 0 has 2 overflow nodes
    n, k = sum(sizes), 2
    coors = jnp.asarray(rng.randn(n, 3).astype(np.float32))
    batch = jnp.asarray(np.repeat(np.arange(2), sizes))
    es = jax.jit(
        lambda c, b: knn_graph(c, k, batch=b, max_graph_size=cap, max_graphs=2)
    )(coors, batch)
    kk = np.asarray(es.senders).size // n
    m = np.asarray(es.mask).reshape(n, kk)
    s = np.asarray(es.senders).reshape(n, kk)
    # dropped rows (positions >= cap in graph 0) fully invalid
    assert not m[4:6].any()
    # survivors = graph 0 truncated to its first cap nodes: compare against
    # the reference on exactly that node subset
    sub = np.concatenate([np.arange(cap), np.arange(6, 10)])
    ridx, rvals, rvalid = _dense_knn_reference(
        coors[sub], k, None, False, batch[sub])
    for row, i in enumerate(sub):
        want = {int(sub[j]) for j in ridx[row][rvalid[row]]}
        got = set(s[i][m[i]].tolist())
        assert got == want, f"node {i}: {got} != {want}"
    # node at position cap-1 of graph 0 (the collision target pre-fix) must
    # still appear as a sender for its neighbors
    assert any(3 in s[i][m[i]] for i in range(cap) if i != 3)


def test_knn_graph_ragged_large_distances_stay_valid():
    """Real pairs with squared distance >= 1e5 (the kNN machinery's masked
    fill) must stay valid on the bucketed ragged path when a graph fills its
    bucket (no padding slots competing at the 1e5 fill) — validity comes
    from the selected slot's grid mask, not a value compare (round-3 review
    fix; the (N, N) fallback behaved this way already). Graphs with padding
    keep the library-wide coordinate-scale contract: selection itself ranks
    the 1e5 padding fills ahead of real d^2 > 1e5 pairs (the reference's own
    masked-fill convention, egnn_pytorch.py:242), so those rows degrade to
    invalid edges — but never to corrupt ones."""
    rng = np.random.RandomState(8)
    sizes = [4, 4]  # both graphs exactly fill the derived bucket: no padding
    n, k = sum(sizes), 2
    coors = jnp.asarray(rng.randn(n, 3).astype(np.float32) * 400.0)  # d^2 ~ 1e5+
    batch = jnp.asarray(np.repeat(np.arange(2), sizes))
    es = knn_graph(coors, k, batch=batch)
    kk = np.asarray(es.senders).size // n
    m = np.asarray(es.mask).reshape(n, kk)
    assert m.all(), "large but real distances must not be masked out"
    ridx, rvals, rvalid = _dense_knn_reference(coors, k, None, False, batch)
    s = np.asarray(es.senders).reshape(n, kk)
    for i in range(n):
        assert set(s[i].tolist()) == set(ridx[i][rvalid[i]].tolist())

    # padded-bucket regime: edges degrade to invalid (scale contract), and
    # the senders that ARE marked valid are always real same-graph nodes
    sizes2 = [5, 3]
    n2 = sum(sizes2)
    coors2 = jnp.asarray(rng.randn(n2, 3).astype(np.float32) * 400.0)
    batch2 = jnp.asarray(np.repeat(np.arange(2), sizes2))
    es2 = knn_graph(coors2, k, batch=batch2)
    kk2 = np.asarray(es2.senders).size // n2
    s2 = np.asarray(es2.senders).reshape(n2, kk2)
    m2 = np.asarray(es2.mask).reshape(n2, kk2)
    bt = np.asarray(batch2)
    for i in range(n2):
        for j in s2[i][m2[i]]:
            assert bt[j] == bt[i] and j != i
