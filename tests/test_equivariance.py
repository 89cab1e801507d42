"""Equivariance tests mirroring the reference suite
(/root/reference/tests/test_equivariance.py): feats invariant, coors
equivariant under rotation+translation, and sensitive to node permutation.
Run in float64 at atol 1e-6, same as the reference."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from egnn_tpu import EGNN
from egnn_tpu.utils import rot

ATOL = 1e-6


def _random_rt(key):
    k1, k2 = jax.random.split(key)
    R = rot(*jax.random.uniform(k1, (3,)))
    T = jax.random.normal(k2, (1, 1, 3))
    return R, T


def _permute_first_two(feats):
    swapped = feats.at[:, 0, :].set(feats[:, 1, :])
    return swapped.at[:, 1, :].set(feats[:, 0, :])


def _run_three(layer_fn, params, feats, coors, R, T, **kw):
    f1, c1 = layer_fn(params, feats, coors @ R + T, **kw)
    f2, c2 = layer_fn(params, feats, coors, **kw)
    f3, c3 = layer_fn(params, _permute_first_two(feats), coors, **kw)
    return (f1, c1), (f2, c2), (f3, c3)


def _check(out1, out2, out3, R, T):
    (f1, c1), (f2, c2), (f3, _) = out1, out2, out3
    np.testing.assert_allclose(f1, f2, atol=ATOL, err_msg="type 0 features are invariant")
    np.testing.assert_allclose(
        c1, c2 @ R + T, atol=ATOL, err_msg="type 1 features are equivariant"
    )
    assert not np.allclose(f1, f3, atol=ATOL), (
        "layer must be equivariant to permutations of node order"
    )


def test_egnn_equivariance():
    key = jax.random.PRNGKey(0)
    layer = EGNN(dim=512, edge_dim=4)
    keys = jax.random.split(key, 6)
    R, T = _random_rt(keys[0])
    feats = jax.random.normal(keys[1], (1, 16, 512))
    coors = jax.random.normal(keys[2], (1, 16, 3))
    edges = jax.random.normal(keys[3], (1, 16, 16, 4))
    mask = jnp.ones((1, 16), dtype=bool)

    params = jax.jit(layer.init)(keys[4], feats, coors, edges, mask)

    apply = jax.jit(layer.apply)

    outs = _run_three(lambda p, f, c, **kw: apply(p, f, c, **kw), params, feats, coors, R, T, edges=edges, mask=mask)
    _check(*outs, R, T)


def test_higher_dimension():
    """5-D coordinates: E(n) for n != 3 is a supported feature (shape check)."""
    key = jax.random.PRNGKey(1)
    layer = EGNN(dim=512, edge_dim=4)
    keys = jax.random.split(key, 4)
    feats = jax.random.normal(keys[0], (1, 16, 512))
    coors = jax.random.normal(keys[1], (1, 16, 5))
    edges = jax.random.normal(keys[2], (1, 16, 16, 4))
    mask = jnp.ones((1, 16), dtype=bool)

    params = jax.jit(layer.init)(keys[3], feats, coors, edges, mask)
    f, c = jax.jit(layer.apply)(params, feats, coors, edges, mask)
    assert f.shape == feats.shape and c.shape == coors.shape


def test_higher_dimension_so5_equivariance():
    """5-D NUMERIC equivariance under a real SO(5) rotation + translation —
    stronger than the reference's shape-only test
    (/root/reference/tests/test_equivariance.py:36-45): samples a random
    orthogonal matrix (QR of a Gaussian, determinant corrected to +1) and
    asserts invariance/equivariance in f64, making E(n != 3) a numeric
    guarantee rather than a no-crash check."""
    key = jax.random.PRNGKey(17)
    layer = EGNN(dim=64, edge_dim=4, norm_coors=True)
    keys = jax.random.split(key, 6)

    # random SO(5): QR of a Gaussian, sign-fix the diagonal for a uniform
    # (Haar) draw over O(5), then flip one column if det == -1.
    g = np.asarray(jax.random.normal(keys[0], (5, 5), dtype=jnp.float64))
    q, r = np.linalg.qr(g)
    q = q * np.sign(np.diag(r))
    if np.linalg.det(q) < 0:
        q[:, 0] = -q[:, 0]
    np.testing.assert_allclose(q @ q.T, np.eye(5), atol=1e-12)
    assert np.linalg.det(q) > 0
    R = jnp.asarray(q)
    T = jax.random.normal(keys[1], (1, 1, 5), dtype=jnp.float64)

    feats = jax.random.normal(keys[2], (1, 16, 64))
    coors = jax.random.normal(keys[3], (1, 16, 5))
    edges = jax.random.normal(keys[4], (1, 16, 16, 4))
    mask = jnp.ones((1, 16), dtype=bool)

    params = jax.jit(layer.init)(keys[5], feats, coors, edges, mask)
    apply = jax.jit(layer.apply)
    outs = _run_three(lambda p, f, c, **kw: apply(p, f, c, **kw),
                      params, feats, coors, R, T, edges=edges, mask=mask)
    _check(*outs, R, T)


def test_egnn_equivariance_with_nearest_neighbors():
    key = jax.random.PRNGKey(2)
    layer = EGNN(dim=512, edge_dim=1, num_nearest_neighbors=8)
    keys = jax.random.split(key, 5)
    R, T = _random_rt(keys[0])
    feats = jax.random.normal(keys[1], (1, 256, 512))
    coors = jax.random.normal(keys[2], (1, 256, 3))
    edges = jax.random.normal(keys[3], (1, 256, 256, 1))
    mask = jnp.ones((1, 256), dtype=bool)

    params = jax.jit(layer.init)(keys[4], feats, coors, edges, mask)

    apply = jax.jit(layer.apply)

    outs = _run_three(lambda p, f, c, **kw: apply(p, f, c, **kw), params, feats, coors, R, T, edges=edges, mask=mask)
    _check(*outs, R, T)


def test_egnn_equivariance_with_coord_norm():
    key = jax.random.PRNGKey(3)
    layer = EGNN(dim=512, edge_dim=1, num_nearest_neighbors=8, norm_coors=True)
    keys = jax.random.split(key, 5)
    R, T = _random_rt(keys[0])
    feats = jax.random.normal(keys[1], (1, 256, 512))
    coors = jax.random.normal(keys[2], (1, 256, 3))
    edges = jax.random.normal(keys[3], (1, 256, 256, 1))
    mask = jnp.ones((1, 256), dtype=bool)

    params = jax.jit(layer.init)(keys[4], feats, coors, edges, mask)

    apply = jax.jit(layer.apply)

    outs = _run_three(lambda p, f, c, **kw: apply(p, f, c, **kw), params, feats, coors, R, T, edges=edges, mask=mask)
    _check(*outs, R, T)


@pytest.mark.parametrize("pool", ["sum", "mean"])
@pytest.mark.parametrize("soft_edges", [False, True])
def test_egnn_equivariance_option_grid(pool, soft_edges):
    """Beyond the reference suite: soft edges, mean pooling, clamping, partial
    masks — all must preserve equivariance."""
    key = jax.random.PRNGKey(4)
    layer = EGNN(
        dim=32,
        edge_dim=2,
        m_pool_method=pool,
        soft_edges=soft_edges,
        coor_weights_clamp_value=2.0,
        norm_coors=True,
        norm_feats=True,
    )
    keys = jax.random.split(key, 5)
    R, T = _random_rt(keys[0])
    feats = jax.random.normal(keys[1], (2, 12, 32))
    coors = jax.random.normal(keys[2], (2, 12, 3))
    edges = jax.random.normal(keys[3], (2, 12, 12, 2))
    mask = jnp.arange(12)[None, :] < jnp.array([[12], [9]])  # partial mask

    params = jax.jit(layer.init)(keys[4], feats, coors, edges, mask)

    apply = jax.jit(layer.apply)

    outs = _run_three(lambda p, f, c, **kw: apply(p, f, c, **kw), params, feats, coors, R, T, edges=edges, mask=mask)
    _check(*outs, R, T)


def test_egnn_only_sparse_neighbors_equivariance():
    key = jax.random.PRNGKey(5)
    n = 16
    # chain adjacency i ~ i+1
    ar = jnp.arange(n)
    adj = (jnp.abs(ar[:, None] - ar[None, :]) == 1)
    layer = EGNN(dim=16, only_sparse_neighbors=True, num_nearest_neighbors=2)
    keys = jax.random.split(key, 4)
    R, T = _random_rt(keys[0])
    feats = jax.random.normal(keys[1], (1, n, 16))
    coors = jax.random.normal(keys[2], (1, n, 3))
    mask = jnp.ones((1, n), dtype=bool)

    params = jax.jit(layer.init)(keys[3], feats, coors, None, mask, adj)

    apply = jax.jit(lambda p, f, c, **kw: layer.apply(p, f, c, adj_mat=adj, **kw))

    outs = _run_three(lambda p, f, c, **kw: apply(p, f, c, **kw), params, feats, coors, R, T, mask=mask)
    _check(*outs, R, T)


def test_egnn_update_flags():
    """update_feats / update_coors toggles leave the other stream untouched."""
    key = jax.random.PRNGKey(6)
    keys = jax.random.split(key, 3)
    feats = jax.random.normal(keys[0], (1, 8, 16))
    coors = jax.random.normal(keys[1], (1, 8, 3))

    layer_f = EGNN(dim=16, update_coors=False)
    pf = jax.jit(layer_f.init)(keys[2], feats, coors)
    f, c = jax.jit(layer_f.apply)(pf, feats, coors)
    np.testing.assert_array_equal(c, coors)
    assert not np.allclose(f, feats)

    layer_c = EGNN(dim=16, update_feats=False)
    pc = jax.jit(layer_c.init)(keys[2], feats, coors)
    f, c = jax.jit(layer_c.apply)(pc, feats, coors)
    np.testing.assert_array_equal(f, feats)
    assert not np.allclose(c, coors)
