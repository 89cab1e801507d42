"""Option-surface tests the reference never had (SURVEY.md §4 gap list):
dropout determinism, return_coor_changes, edge-token + adjacency-degree
embeddings through the full network."""
import jax
import jax.numpy as jnp
import numpy as np

from egnn_tpu import EGNN, EGNNNetwork
from egnn_tpu.utils import rot


def test_dropout_determinism():
    layer = EGNN(dim=8, dropout=0.5)
    key = jax.random.PRNGKey(0)
    feats = jax.random.normal(key, (1, 12, 8))
    coors = jax.random.normal(key, (1, 12, 3))
    params = layer.init(key, feats, coors)

    # eval mode: dropout inert, deterministic
    f1, c1 = layer.apply(params, feats, coors, deterministic=True)
    f2, c2 = layer.apply(params, feats, coors, deterministic=True)
    np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))

    # train mode: same rng -> same output; different rng -> different output
    r1 = layer.apply(params, feats, coors, deterministic=False,
                     rngs={"dropout": jax.random.PRNGKey(1)})
    r1b = layer.apply(params, feats, coors, deterministic=False,
                      rngs={"dropout": jax.random.PRNGKey(1)})
    r2 = layer.apply(params, feats, coors, deterministic=False,
                     rngs={"dropout": jax.random.PRNGKey(2)})
    np.testing.assert_array_equal(np.asarray(r1[0]), np.asarray(r1b[0]))
    assert not np.allclose(np.asarray(r1[0]), np.asarray(r2[0]))
    # dropout must not leak into the equivariant stream's direction: coords
    # still transform correctly under the same rng
    R = rot(0.1, 0.2, 0.3)
    r1_rot = layer.apply(params, feats, coors @ R, deterministic=False,
                         rngs={"dropout": jax.random.PRNGKey(1)})
    np.testing.assert_allclose(np.asarray(r1[1] @ R), np.asarray(r1_rot[1]),
                               atol=1e-9)


def test_return_coor_changes():
    net = EGNNNetwork(depth=3, dim=8, num_tokens=5)
    key = jax.random.PRNGKey(0)
    tokens = jax.random.randint(key, (1, 10), 0, 5)
    coors = jax.random.normal(key, (1, 10, 3))
    params = net.init(key, tokens, coors)
    feats, out, changes = net.apply(params, tokens, coors,
                                    return_coor_changes=True)
    # reference records initial coords plus one entry per layer
    # (egnn_pytorch.py:442-449)
    assert len(changes) == 4
    np.testing.assert_array_equal(np.asarray(changes[0]), np.asarray(coors))
    np.testing.assert_array_equal(np.asarray(changes[-1]), np.asarray(out))


def test_network_edge_tokens_and_adj_degrees_equivariance():
    n = 12
    net = EGNNNetwork(
        depth=2, dim=8, num_tokens=5, num_edge_tokens=3, edge_dim=4,
        num_adj_degrees=3, adj_dim=4,
    )
    key = jax.random.PRNGKey(0)
    tokens = jax.random.randint(key, (1, n), 0, 5)
    coors = jax.random.normal(jax.random.PRNGKey(1), (1, n, 3))
    edges = jax.random.randint(jax.random.PRNGKey(2), (1, n, n), 0, 3)
    ar = jnp.arange(n)
    adj = jnp.abs(ar[:, None] - ar[None, :]) == 1
    params = net.init(key, tokens, coors, adj_mat=adj, edges=edges)

    f1, c1 = net.apply(params, tokens, coors, adj_mat=adj, edges=edges)
    R = rot(0.5, -0.3, 0.8)
    T = jnp.asarray([2.0, -1.0, 0.5])
    f2, c2 = net.apply(params, tokens, coors @ R + T, adj_mat=adj, edges=edges)
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f2), atol=1e-8)
    np.testing.assert_allclose(np.asarray(c1 @ R + T), np.asarray(c2), atol=1e-8)
    # permuting node identities must change outputs (uses per-node identity)
    tokens_perm = tokens.at[0, 0].set(tokens[0, 1]).at[0, 1].set(tokens[0, 0])
    if int(tokens[0, 0]) != int(tokens[0, 1]):
        f3, _ = net.apply(params, tokens_perm, coors, adj_mat=adj, edges=edges)
        assert not np.allclose(np.asarray(f1), np.asarray(f3))
