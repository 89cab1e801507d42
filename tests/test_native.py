"""Native host-side graph runtime (egnn_tpu/native): parity vs the jnp
builders and vs the numpy fallbacks.

The C++ runtime replaces the host role of the reference's external native
graph deps (torch-cluster kNN/radius construction, torch-scatter's sorted
layouts — examples/egnn_test.ipynb cell 4). Parity contract: identical
senders/receivers/mask to egnn_tpu.ops.graph on the same inputs, including
jax.lax.top_k's lower-index tie-breaking.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from egnn_tpu import native as nat
from egnn_tpu.ops.graph import knn_graph, radius_graph


def test_native_builds():
    assert nat.is_available(), f"native build failed:\n{nat.build_error()}"
    assert nat.num_threads() >= 1


@pytest.mark.parametrize("n,c,k,masked,loop", [
    (16, 3, 4, False, False),
    (33, 3, 8, True, False),
    (100, 5, 8, True, False),
    (24, 3, 6, False, True),
])
def test_knn_parity_vs_jnp(n, c, k, masked, loop):
    rng = np.random.RandomState(n + k)
    coors = rng.randn(n, c)
    nm = (rng.rand(n) > 0.25) if masked else None
    s, r, m = nat.knn_graph_np(coors, k, node_mask=nm, loop=loop)
    ref = knn_graph(jnp.asarray(coors), k,
                    node_mask=None if nm is None else jnp.asarray(nm),
                    loop=loop)
    np.testing.assert_array_equal(s, np.asarray(ref.senders))
    np.testing.assert_array_equal(r, np.asarray(ref.receivers))
    np.testing.assert_array_equal(m, np.asarray(ref.mask))
    # and the numpy fallback agrees with the native path
    s2, r2, m2 = nat._knn_graph_numpy(
        np.asarray(coors, np.float64), k, nm, loop)
    np.testing.assert_array_equal(s2, s)
    np.testing.assert_array_equal(r2, r)
    np.testing.assert_array_equal(m2, m)


def test_knn_tie_breaking_matches_top_k():
    # coincident points -> equal distances; both sides must break ties by
    # lower index (jax.lax.top_k semantics).
    coors = np.zeros((8, 3))
    coors[4:] = 1.0
    s, r, m = nat.knn_graph_np(coors, 3)
    ref = knn_graph(jnp.asarray(coors), 3)
    np.testing.assert_array_equal(s, np.asarray(ref.senders))
    np.testing.assert_array_equal(m, np.asarray(ref.mask))


def test_batched_knn_matches_vmapped_single():
    import jax

    rng = np.random.RandomState(7)
    g, na, c, k = 5, 12, 3, 4
    coors = rng.randn(g, na, c)
    nm = rng.rand(g, na) > 0.3
    s, r, m = nat.batched_knn_graph_np(coors, k, node_mask=nm)
    es = jax.vmap(lambda co, mm: knn_graph(co, k, node_mask=mm))(
        jnp.asarray(coors), jnp.asarray(nm))
    off = (np.arange(g, dtype=np.int32) * na)[:, None]
    np.testing.assert_array_equal(s, (np.asarray(es.senders) + off).reshape(-1))
    np.testing.assert_array_equal(r, (np.asarray(es.receivers) + off).reshape(-1))
    np.testing.assert_array_equal(m, np.asarray(es.mask).reshape(-1))
    # fallback parity
    fb = nat.batched_knn_graph_np.__wrapped__ if hasattr(
        nat.batched_knn_graph_np, "__wrapped__") else None
    del fb


@pytest.mark.parametrize("cap_kind", ["tight", "loose"])
def test_radius_parity_vs_jnp(cap_kind):
    rng = np.random.RandomState(3)
    n = 40
    coors = rng.randn(n, 3)
    nm = rng.rand(n) > 0.2
    cap = 20 if cap_kind == "tight" else n * n
    s, r, m = nat.radius_graph_np(coors, 1.5, cap, node_mask=nm)
    ref = radius_graph(jnp.asarray(coors), 1.5, cap, node_mask=jnp.asarray(nm))
    np.testing.assert_array_equal(s, np.asarray(ref.senders))
    np.testing.assert_array_equal(r, np.asarray(ref.receivers))
    np.testing.assert_array_equal(m, np.asarray(ref.mask))


def test_sort_edges_by_receiver_stable():
    rng = np.random.RandomState(1)
    e, n = 300, 25
    recv = rng.randint(0, n, size=e).astype(np.int32)
    mask = rng.rand(e) > 0.3
    perm = nat.sort_edges_by_receiver_np(recv, mask, n)
    assert sorted(perm.tolist()) == list(range(e))  # a permutation
    key = np.where(mask, recv, n)
    np.testing.assert_array_equal(key[perm], np.sort(key, kind="stable"))
    for b in range(n + 1):  # stability within each receiver bucket
        idxs = perm[key[perm] == b]
        np.testing.assert_array_equal(idxs, np.sort(idxs))
    # no mask -> plain stable sort by receiver
    perm2 = nat.sort_edges_by_receiver_np(recv, None, n)
    np.testing.assert_array_equal(recv[perm2], np.sort(recv, kind="stable"))


def test_pack_batch():
    bi, nm = nat.pack_batch_np(np.array([3, 5, 0, 2]), 6)
    assert bi.shape == (24,) and nm.shape == (24,)
    np.testing.assert_array_equal(bi, np.repeat(np.arange(4), 6))
    assert nm.sum() == 10
    np.testing.assert_array_equal(nm[:6], [1, 1, 1, 0, 0, 0])
    with pytest.raises(ValueError):
        nat.pack_batch_np(np.array([7]), 6)
