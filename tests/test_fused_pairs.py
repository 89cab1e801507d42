"""Dense kNN layer with fused_pairs=True (pre-gathered pair kernel fed by
the combined selection gather, interpret mode on CPU) vs the XLA pipeline:
outputs and gradients must match, including the wide kc-slot + winner-mask
layout (forced via backend='packed', which exercises the sublane padding)."""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from egnn_tpu import EGNN
from egnn_tpu.ops import neighbors as nb


def _setup(seed, n=64, k=8, d=16, **kw):
    key = jax.random.PRNGKey(seed)
    feats = 0.5 * jax.random.normal(key, (1, n, d), jnp.float32)
    coors = jax.random.normal(jax.random.PRNGKey(seed + 1), (1, n, 3),
                              jnp.float32) * 2.0
    common = dict(dim=d, num_nearest_neighbors=k, **kw)
    ref = EGNN(**common)
    fused = EGNN(**common, fused_pairs=True)
    params = ref.init(jax.random.PRNGKey(seed + 2), feats, coors)
    return ref, fused, params, feats, coors


CASES = [
    dict(),
    dict(norm_coors=True, coor_weights_clamp_value=1.5, fourier_features=2),
    dict(soft_edges=True, m_pool_method="mean"),
]


@pytest.mark.parametrize("opts", CASES)
@pytest.mark.parametrize("with_mask", [False, True])
def test_fused_pairs_parity(opts, with_mask):
    ref, fused, params, feats, coors = _setup(0, **opts)
    mask = ((jax.random.uniform(jax.random.PRNGKey(9), (1, 64)) > 0.2)
            if with_mask else None)

    o_ref = ref.apply(params, feats, coors, mask=mask)
    o_fused = fused.apply(params, feats, coors, mask=mask)
    for a, b in zip(o_fused, o_ref):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-5)

    def loss(net, p, f, c):
        fo, co = net.apply(p, f, c, mask=mask)
        return (fo ** 2).mean() + (jnp.tanh(co) ** 2).mean()

    gr = jax.grad(lambda p, f, c: loss(ref, p, f, c), argnums=(0, 1, 2))(
        params, feats, coors)
    gf = jax.grad(lambda p, f, c: loss(fused, p, f, c), argnums=(0, 1, 2))(
        params, feats, coors)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=3e-4, atol=3e-5),
        gf, gr)


def test_fused_pairs_wide_winner_parity():
    """Force the packed candidate path (kc = k+4 slots + winner mask, kc not
    a sublane multiple -> exercises the zero-pv padding) and compare the
    fused consumer against the XLA wide consumer."""
    ref, fused, params, feats, coors = _setup(3, n=128, k=8, norm_coors=True)
    orig = nb.knn_select_gather

    @functools.wraps(orig)
    def patched(*a, **kw):
        kw["backend"] = "packed"
        kw["interpret"] = True
        return orig(*a, **kw)

    nb.knn_select_gather = patched
    try:
        o_ref = ref.apply(params, feats, coors)
        o_fused = fused.apply(params, feats, coors)
        for a, b in zip(o_fused, o_ref):
            np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-5)

        def loss(net, p):
            fo, co = net.apply(p, feats, coors)
            return (fo ** 2).mean() + (co ** 2).mean()

        gr = jax.grad(lambda p: loss(ref, p))(params)
        gf = jax.grad(lambda p: loss(fused, p))(params)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                a, b, rtol=3e-4, atol=3e-5),
            gf, gr)
    finally:
        nb.knn_select_gather = orig


def test_fused_pairs_fallback_unsupported():
    """Dense edge features are outside the kernel's scope: the flag must
    silently use the XLA path and still match it."""
    d, n, k = 16, 64, 8
    key = jax.random.PRNGKey(0)
    feats = jax.random.normal(key, (1, n, d), jnp.float32)
    coors = jax.random.normal(jax.random.PRNGKey(1), (1, n, 3), jnp.float32)
    edges = jax.random.normal(jax.random.PRNGKey(2), (1, n, n, 4), jnp.float32)
    ref = EGNN(dim=d, edge_dim=4, num_nearest_neighbors=k)
    fused = EGNN(dim=d, edge_dim=4, num_nearest_neighbors=k, fused_pairs=True)
    params = ref.init(jax.random.PRNGKey(3), feats, coors, edges)
    o_ref = ref.apply(params, feats, coors, edges)
    o_fused = fused.apply(params, feats, coors, edges)
    for a, b in zip(o_fused, o_ref):
        np.testing.assert_array_equal(a, b)


def test_fused_pairs_adjacency_parity():
    """The flagship bench arm runs fused_pairs UNDER an adjacency matrix
    (EGNN_Network passes adj_mat through to the layer): selection then
    carries the -1/0 rank fills, and the pair kernel consumes the gathered
    results + nbhd.valid. Outputs and full gradients must match the XLA
    pipeline in exactly this configuration."""
    n, k, d = 64, 8, 16
    ref, fused, params, feats, coors = _setup(
        5, n=n, k=k, d=d, norm_coors=True, coor_weights_clamp_value=2.0)
    ar = np.arange(n)
    adj = np.zeros((n, n), bool)
    adj[ar[:-1], ar[1:]] = adj[ar[1:], ar[:-1]] = True
    adj = jnp.asarray(adj[None])
    mask = jax.random.uniform(jax.random.PRNGKey(11), (1, n)) > 0.2

    o_ref = ref.apply(params, feats, coors, mask=mask, adj_mat=adj)
    o_fused = fused.apply(params, feats, coors, mask=mask, adj_mat=adj)
    for a, b in zip(o_fused, o_ref):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-5)

    def loss(net, p, f, c):
        fo, co = net.apply(p, f, c, mask=mask, adj_mat=adj)
        return (fo ** 2).mean() + (jnp.tanh(co) ** 2).mean()

    gr = jax.grad(lambda p, f, c: loss(ref, p, f, c), argnums=(0, 1, 2))(
        params, feats, coors)
    gf = jax.grad(lambda p, f, c: loss(fused, p, f, c), argnums=(0, 1, 2))(
        params, feats, coors)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=3e-4, atol=3e-5),
        gf, gr)
