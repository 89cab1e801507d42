"""Sparse k-hop neighbor-list expansion vs a dense BFS oracle.

khop_neighbor_lists is the scalable (no (n,n)) analog of the notebook's
torch-sparse nth_deg_adjacency variant; its contract is clean min-hop BFS
labels (NOT the reference XOR quirk — that stays in
expand_adjacency_degrees, parity-pinned elsewhere)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from egnn_tpu.ops import khop_neighbor_lists


def _dense_bfs(adj, D):
    """Min-hop distance labels (1..D) along directed edges, self excluded."""
    n = adj.shape[0]
    dist = np.full((n, n), 0, np.int32)
    reach = np.eye(n, dtype=bool)  # hop 0
    frontier = np.eye(n, dtype=bool)
    for d in range(1, D + 1):
        nxt = (frontier.astype(np.int32) @ adj.astype(np.int32)) > 0
        new = nxt & ~reach
        dist[new] = d
        reach |= new
        frontier = new
    np.fill_diagonal(dist, 0)
    return dist


def _lists_from_adj(adj, c0):
    n = adj.shape[0]
    nbr = np.zeros((n, c0), np.int32)
    msk = np.zeros((n, c0), bool)
    for i in range(n):
        js = np.nonzero(adj[i])[0]
        assert len(js) <= c0
        nbr[i, : len(js)] = js
        msk[i, : len(js)] = True
    return jnp.asarray(nbr), jnp.asarray(msk)


@pytest.mark.parametrize("seed,n,p,D", [(0, 30, 0.1, 2), (1, 40, 0.08, 3),
                                        (2, 25, 0.15, 4), (3, 50, 0.05, 3)])
def test_khop_matches_dense_bfs(seed, n, p, D):
    rng = np.random.default_rng(seed)
    adj = rng.random((n, n)) < p
    np.fill_diagonal(adj, False)
    c0 = max(int(adj.sum(1).max()), 1)
    nbr, msk = _lists_from_adj(adj, c0)
    ids, deg, mask = jax.jit(
        lambda a, m: khop_neighbor_lists(a, m, D)
    )(nbr, msk)
    oracle = _dense_bfs(adj, D)
    got = np.zeros_like(oracle)
    ids, deg, mask = np.asarray(ids), np.asarray(deg), np.asarray(mask)
    for i in range(n):
        for s in range(ids.shape[1]):
            if mask[i, s]:
                assert got[i, ids[i, s]] == 0, "duplicate id emitted"
                got[i, ids[i, s]] = deg[i, s]
    np.testing.assert_array_equal(got, oracle)
    # invariants: masked slots carry sentinels; ids ascending within a row
    assert (ids[~mask] == n).all() and (deg[~mask] == 0).all()
    for i in range(n):
        row = ids[i, mask[i]]
        assert (np.diff(row) > 0).all()


def test_khop_truncation_keeps_lowest_ids():
    # star-out: node 0 -> everyone, so 1-hop set of node 0 is n-1 wide
    n = 20
    adj = np.zeros((n, n), bool)
    adj[0, 1:] = True
    nbr, msk = _lists_from_adj(adj, n - 1)
    ids, deg, mask = khop_neighbor_lists(nbr, msk, 1, cap_out=5)
    assert mask[0].sum() == 5
    np.testing.assert_array_equal(np.asarray(ids[0]), [1, 2, 3, 4, 5])
    assert (np.asarray(deg[0]) == 1).all()


def test_khop_chain_degrees():
    # directed chain 0->1->2->...: node 0 reaches i at hop i
    n, D = 12, 4
    adj = np.zeros((n, n), bool)
    for i in range(n - 1):
        adj[i, i + 1] = True
    nbr, msk = _lists_from_adj(adj, 1)
    ids, deg, mask = khop_neighbor_lists(nbr, msk, D)
    row = {int(i): int(d) for i, d, m in
           zip(ids[0], deg[0], mask[0]) if m}
    assert row == {i: i for i in range(1, D + 1)}


def test_khop_no_mask_means_all_valid():
    n = 16
    rng = np.random.default_rng(5)
    nbr = jnp.asarray(rng.integers(0, n, (n, 4)), jnp.int32)
    a, _, _ = khop_neighbor_lists(nbr, None, 2)
    b, _, _ = khop_neighbor_lists(nbr, jnp.ones((n, 4), bool), 2)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
