"""Fused uniform-degree sparse pipeline (ops/pallas/pair_messages via
EGNNSparse(fused_uniform=True), interpret mode on CPU) vs the XLA per-edge
path: outputs and ALL gradients (params + inputs) must match. The kernel's
backward is fully hand-written, so every option combination that changes the
dataflow gets a case — in particular soft_edge, whose gate applies only to
the feature aggregation in the sparse path (gate_feats_only)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from egnn_tpu import EGNNSparse, EGNNSparseNetwork


def _uniform_edges(n, k):
    """Receiver-major uniform-degree layout, self-free senders."""
    i = jnp.repeat(jnp.arange(n, dtype=jnp.int32), k)
    t = jnp.tile(jnp.arange(k, dtype=jnp.int32), n)
    j = (i + 1 + t) % n
    return jnp.stack([j, i])


def _case(seed, n=64, k=8, d=16, **layer_kwargs):
    key = jax.random.PRNGKey(seed)
    coors = jax.random.normal(key, (n, 3), jnp.float32)
    feats = 0.5 * jax.random.normal(jax.random.PRNGKey(seed + 1), (n, d), jnp.float32)
    x = jnp.concatenate([coors, feats], axis=-1)
    ei = _uniform_edges(n, k)
    common = dict(feats_dim=d, uniform_degree=k, **layer_kwargs)
    ref = EGNNSparse(**common, fused_uniform=False)
    fused = EGNNSparse(**common, fused_uniform=True)
    params = ref.init(jax.random.PRNGKey(seed + 2), x, ei)
    return ref, fused, params, x, ei


OPTION_CASES = [
    dict(),
    dict(soft_edge=1),                                  # gate_feats_only path
    dict(norm_coors=True, coor_weights_clamp_value=1.5, fourier_features=2),
    dict(soft_edge=1, norm_coors=True, norm_feats=True),
    dict(aggr="mean"),
]


@pytest.mark.parametrize("opts", OPTION_CASES)
def test_fused_uniform_layer_parity(opts):
    ref, fused, params, x, ei = _case(0, **opts)
    kw = {}
    out_ref = ref.apply(params, x, ei, **kw)
    out_fused = fused.apply(params, x, ei, **kw)
    np.testing.assert_allclose(out_fused, out_ref, rtol=2e-4, atol=2e-5)

    def loss(fn, p, xx):
        o = fn.apply(p, xx, ei, **kw)
        return (o[:, :3] ** 2).sum() + (jnp.tanh(o[:, 3:]) ** 2).sum()

    gr_p, gr_x = jax.grad(lambda p, xx: loss(ref, p, xx), argnums=(0, 1))(params, x)
    gf_p, gf_x = jax.grad(lambda p, xx: loss(fused, p, xx), argnums=(0, 1))(params, x)
    np.testing.assert_allclose(gf_x, gr_x, rtol=2e-4, atol=2e-5)
    flat_r = jax.tree_util.tree_leaves_with_path(gr_p)
    flat_f = jax.tree_util.tree_leaves_with_path(gf_p)
    for (pr, lr), (pf, lf) in zip(flat_r, flat_f):
        assert pr == pf
        np.testing.assert_allclose(
            lf, lr, rtol=3e-4, atol=3e-5,
            err_msg=f"param grad mismatch at {jax.tree_util.keystr(pr)}")


def test_fused_uniform_masked_mean_parity():
    """Padded edge slots (mask False) + mean aggregation + node_mask'd
    LayerNorm stats — the static-capacity batch shape."""
    n, k, d = 64, 8, 12
    ref, fused, params, x, ei = _case(3, n=n, k=k, d=d, aggr="mean",
                                      norm_feats=True)
    em = (jax.random.uniform(jax.random.PRNGKey(9), (n * k,)) > 0.3)
    nm = jnp.ones((n,), bool).at[-5:].set(False)
    batch = (jnp.arange(n) >= n // 2).astype(jnp.int32)
    kw = dict(edge_mask=em, node_mask=nm, batch=batch, num_graphs=2)
    out_ref = ref.apply(params, x, ei, **kw)
    out_fused = fused.apply(params, x, ei, **kw)
    np.testing.assert_allclose(out_fused, out_ref, rtol=2e-4, atol=2e-5)

    def loss(fn, p):
        o = fn.apply(p, x, ei, **kw)
        return (o ** 2).sum()

    gr = jax.grad(lambda p: loss(ref, p))(params)
    gf = jax.grad(lambda p: loss(fused, p))(params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=3e-4, atol=3e-5),
        gf, gr)


def test_fused_uniform_network_parity():
    """Network-level: embeddings + norm layers + 2 mpnn layers."""
    G, NA, K, demb = 2, 32, 8, 16
    N = G * NA
    key = jax.random.PRNGKey(0)
    coors = jax.random.normal(key, (N, 3), jnp.float32)
    types = jax.random.randint(jax.random.PRNGKey(1), (N, 1), 0, 5)
    x = jnp.concatenate([coors, types.astype(jnp.float32)], -1)
    ei = jnp.concatenate(
        [_uniform_edges(NA, K) + g * NA for g in range(G)], axis=1)
    batch = jnp.repeat(jnp.arange(G, dtype=jnp.int32), NA)
    common = dict(n_layers=2, feats_dim=1, embedding_nums=[5],
                  embedding_dims=[demb], fourier_features=2, norm_feats=True,
                  norm_coors=True, uniform_degree=K)
    ref = EGNNSparseNetwork(**common, fused_uniform=False)
    fused = EGNNSparseNetwork(**common, fused_uniform=True)
    params = ref.init(key, x, ei, batch=batch, num_graphs=G)
    o_ref = ref.apply(params, x, ei, batch=batch, num_graphs=G)
    o_fused = fused.apply(params, x, ei, batch=batch, num_graphs=G)
    np.testing.assert_allclose(o_fused, o_ref, rtol=3e-4, atol=3e-5)


def test_fused_uniform_fallback_unsupported():
    """Configs the kernel can't take (k not a sublane multiple, edge_attr)
    silently use the XLA path even when forced on."""
    n, k, d = 32, 5, 8
    i = jnp.repeat(jnp.arange(n, dtype=jnp.int32), k)
    j = (i + 1 + jnp.tile(jnp.arange(k, dtype=jnp.int32), n)) % n
    ei = jnp.stack([j, i])
    x = jax.random.normal(jax.random.PRNGKey(0), (n, 3 + d), jnp.float32)
    layer = EGNNSparse(feats_dim=d, uniform_degree=k, fused_uniform=True)
    params = layer.init(jax.random.PRNGKey(1), x, ei)
    out = layer.apply(params, x, ei)
    assert out.shape == (n, 3 + d)
