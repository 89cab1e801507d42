"""compute_dtype=bfloat16 message path: close to f32, geometry still f32,
equivariance intact at bf16 tolerance."""
import jax
import jax.numpy as jnp
import numpy as np

from egnn_tpu import EGNN
from egnn_tpu.utils import rot


def _case(n=64, d=32):
    key = jax.random.PRNGKey(0)
    feats = jax.random.normal(key, (1, n, d), jnp.float32)
    coors = jax.random.normal(jax.random.PRNGKey(1), (1, n, 3), jnp.float32)
    mask = jax.random.uniform(jax.random.PRNGKey(2), (1, n)) > 0.2
    return feats, coors, mask


def test_bf16_close_to_f32():
    d = 32
    feats, coors, mask = _case(d=d)
    f32_layer = EGNN(dim=d, num_nearest_neighbors=8, norm_coors=True)
    bf_layer = EGNN(dim=d, num_nearest_neighbors=8, norm_coors=True,
                    compute_dtype=jnp.bfloat16)
    params = f32_layer.init(jax.random.PRNGKey(3), feats, coors, mask=mask)
    f1, c1 = f32_layer.apply(params, feats, coors, mask=mask)
    f2, c2 = bf_layer.apply(params, feats, coors, mask=mask)
    np.testing.assert_allclose(
        np.asarray(f1, np.float32), np.asarray(f2, np.float32), rtol=0, atol=0.05
    )
    np.testing.assert_allclose(
        np.asarray(c1, np.float32), np.asarray(c2, np.float32), rtol=0, atol=0.05
    )


def test_bf16_equivariance():
    d = 16
    feats, coors, mask = _case(d=d)
    layer = EGNN(dim=d, num_nearest_neighbors=6, norm_coors=True,
                 compute_dtype=jnp.bfloat16)
    params = layer.init(jax.random.PRNGKey(0), feats, coors, mask=mask)
    R = rot(0.3, -0.6, 1.2).astype(jnp.float32)
    T = jnp.asarray([1.0, 2.0, -0.5], jnp.float32)
    f1, c1 = layer.apply(params, feats, coors, mask=mask)
    f2, c2 = layer.apply(params, feats, coors @ R + T, mask=mask)
    # bf16 messages perturb the *weights* of the coordinate combination,
    # not its equivariant structure; f32 geometry keeps the transform tight
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f2), atol=2e-2)
    np.testing.assert_allclose(np.asarray(c1 @ R + T), np.asarray(c2), atol=2e-2)


def test_bf16_grads_finite():
    d = 16
    feats, coors, mask = _case(d=d)
    layer = EGNN(dim=d, num_nearest_neighbors=6, compute_dtype=jnp.bfloat16)
    params = layer.init(jax.random.PRNGKey(0), feats, coors, mask=mask)

    def loss(p):
        f, c = layer.apply(p, feats, coors, mask=mask)
        return (f**2).mean() + (c**2).mean()

    g = jax.grad(loss)(params)
    ptypes = [l.dtype for l in jax.tree_util.tree_leaves(params)]
    for leaf, pt in zip(jax.tree_util.tree_leaves(g), ptypes):
        assert leaf.dtype == pt  # grads keep the (full-precision) param dtype
        assert bool(jnp.isfinite(leaf).all())


def test_sparse_bf16_close_to_f32():
    from egnn_tpu import EGNN_Sparse
    from egnn_tpu.ops.graph import knn_graph

    coors = jax.random.normal(jax.random.PRNGKey(0), (40, 3), jnp.float32)
    feats = jax.random.normal(jax.random.PRNGKey(1), (40, 8), jnp.float32)
    x = jnp.concatenate([coors, feats], -1)
    es = knn_graph(coors, 4)
    l32 = EGNN_Sparse(feats_dim=8, norm_coors=True)
    lbf = EGNN_Sparse(feats_dim=8, norm_coors=True, compute_dtype=jnp.bfloat16)
    p = l32.init(jax.random.PRNGKey(2), x, es.edge_index, edge_mask=es.mask)
    o1 = l32.apply(p, x, es.edge_index, edge_mask=es.mask)
    o2 = lbf.apply(p, x, es.edge_index, edge_mask=es.mask)
    np.testing.assert_allclose(
        np.asarray(o1, np.float32), np.asarray(o2, np.float32), atol=0.05
    )
