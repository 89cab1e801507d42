"""Streamed all-pairs path vs the materialized path: same values, same grads.

The streamed path (ops/pairwise_stream.py) is a j-chunked scan with
rematerialization; it must be numerically indistinguishable (up to summation
order) from the reference-parity materialized branch of models/egnn.py across
the option surface: mask, fourier, soft_edges, norm_coors, clamp, mean pool,
update flags.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from egnn_tpu import EGNN


def _inputs(seed, b=2, n=40, d=16, c=3, with_mask=True):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    feats = jax.random.normal(ks[0], (b, n, d))
    coors = jax.random.normal(ks[1], (b, n, c))
    mask = None
    if with_mask:
        mask = jax.random.uniform(ks[2], (b, n)) > 0.2
    return feats, coors, mask


CASES = [
    dict(),
    dict(fourier_features=2),
    dict(soft_edges=True),
    dict(norm_coors=True),
    dict(coor_weights_clamp_value=1.5),
    dict(m_pool_method="mean"),
    dict(update_coors=False),
    dict(update_feats=False),
    dict(norm_feats=True, fourier_features=4, soft_edges=True, norm_coors=True,
         coor_weights_clamp_value=2.0, m_pool_method="mean"),
]


@pytest.mark.parametrize("with_mask", [True, False])
@pytest.mark.parametrize("case", CASES, ids=[str(i) for i in range(len(CASES))])
def test_stream_matches_materialized(case, with_mask):
    d = 16
    feats, coors, mask = _inputs(0, with_mask=with_mask)
    naive = EGNN(dim=d, stream_pairwise=False, **case)
    stream = EGNN(dim=d, stream_pairwise=True, pairwise_chunk=16, **case)

    params = naive.init(jax.random.PRNGKey(1), feats, coors, mask=mask)
    f1, c1 = jax.jit(naive.apply)(params, feats, coors, mask=mask)
    f2, c2 = jax.jit(stream.apply)(params, feats, coors, mask=mask)

    np.testing.assert_allclose(np.asarray(f1), np.asarray(f2), rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), rtol=1e-9, atol=1e-9)


def test_stream_grads_match():
    d = 16
    feats, coors, mask = _inputs(3)
    case = dict(fourier_features=2, norm_coors=True, soft_edges=True)
    naive = EGNN(dim=d, stream_pairwise=False, **case)
    stream = EGNN(dim=d, stream_pairwise=True, pairwise_chunk=8, **case)
    params = naive.init(jax.random.PRNGKey(1), feats, coors, mask=mask)

    def loss(mod, p, f, co):
        fo, co_o = mod.apply(p, f, co, mask=mask)
        return (fo**2).mean() + (co_o**2).mean()

    g1 = jax.grad(lambda p, f, co: loss(naive, p, f, co), argnums=(0, 1, 2))(
        params, feats, coors
    )
    g2 = jax.grad(lambda p, f, co: loss(stream, p, f, co), argnums=(0, 1, 2))(
        params, feats, coors
    )
    flat1 = jax.tree_util.tree_leaves(g1)
    flat2 = jax.tree_util.tree_leaves(g2)
    for a, b_ in zip(flat1, flat2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-8, atol=1e-9)


def test_stream_equivariance():
    from egnn_tpu.utils import rot

    d = 8
    feats, coors, _ = _inputs(7, b=1, n=50, d=d, with_mask=False)
    layer = EGNN(dim=d, stream_pairwise=True, pairwise_chunk=16, norm_coors=True)
    params = layer.init(jax.random.PRNGKey(0), feats, coors)
    R = rot(0.2, 0.8, -0.4).astype(coors.dtype)
    T = jnp.asarray([1.0, -2.0, 0.5], coors.dtype)
    f1, c1 = jax.jit(layer.apply)(params, feats, coors)
    f2, c2 = jax.jit(layer.apply)(params, feats, coors @ R + T)
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f2), atol=1e-8)
    np.testing.assert_allclose(np.asarray(c1 @ R + T), np.asarray(c2), atol=1e-8)


def test_auto_threshold_smoke():
    # n >= 1024 triggers streaming automatically; just check it runs and is
    # finite on a modest size by forcing the auto path with explicit flag off.
    feats, coors, mask = _inputs(9, b=1, n=64, d=8)
    layer = EGNN(dim=8)
    params = layer.init(jax.random.PRNGKey(0), feats, coors, mask=mask)
    f, c = jax.jit(layer.apply)(params, feats, coors, mask=mask)
    assert bool(jnp.isfinite(f).all()) and bool(jnp.isfinite(c).all())
