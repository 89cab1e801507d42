"""Statistical dropout-rate tests (VERDICT r4 item 9).

The reference wires Dropout between the first Linear and SiLU of the edge,
node, and coors MLPs (/root/reference/egnn_pytorch/egnn_pytorch.py:180,199,
205). Deterministic parity is pinned elsewhere; these tests assert the
APPLIED rate and the inverted-dropout scaling on both execution paths:

- materialized (models/egnn.py, flax nn.Dropout): capture the Dropout
  modules' outputs and compare against the deterministic run's — the zero
  fraction must match the rate and surviving entries must be scaled 1/keep.
- streamed (ops/pairwise_stream.py, functional fold_in RNG): average the
  block outputs over many draws and compare against the closed-form
  elementwise expectation E[f(drop(h))] = keep * f(h / keep) (f(0) = 0 for
  the SiLU chains involved), which pins both rate and scaling.
"""
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from egnn_tpu import EGNN
from egnn_tpu.ops.pairwise_stream import PairwiseParams, pairwise_block


def _silu(x):
    return x * jax.nn.sigmoid(x)


def _dropout_filter(mdl, _method):
    return isinstance(mdl, nn.Dropout)


def test_materialized_dropout_rate_and_scaling():
    """nn.Dropout captures: zero fraction == rate (binomial tolerance) and
    surviving entries are exactly det / keep (inverted dropout)."""
    rate = 0.5
    layer = EGNN(dim=8, dropout=rate)
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 4)
    feats = jax.random.normal(ks[0], (1, 16, 8))
    coors = jax.random.normal(ks[1], (1, 16, 3))
    params = layer.init(ks[2], feats, coors)

    _, det_inter = layer.apply(
        params, feats, coors, deterministic=True,
        capture_intermediates=_dropout_filter, mutable=["intermediates"],
    )
    _, sto_inter = layer.apply(
        params, feats, coors, deterministic=False,
        rngs={"dropout": ks[3]},
        capture_intermediates=_dropout_filter, mutable=["intermediates"],
    )
    det_leaves = jax.tree.leaves(det_inter)
    sto_leaves = jax.tree.leaves(sto_inter)
    assert len(det_leaves) == len(sto_leaves) >= 3, (
        "expected captures from the edge, node, and coors MLP Dropouts"
    )
    # applied rate: dropped positions are exactly zero regardless of input
    # (inputs are a.s. nonzero), so the zero fraction over ALL sites
    # estimates the rate even where the stochastic run's inputs have
    # diverged from the deterministic run's (downstream of the first site).
    total = sum(int(np.asarray(s).size) for s in sto_leaves)
    zeroed = sum(int((np.asarray(s) == 0.0).sum()) for s in sto_leaves)
    frac = zeroed / total
    sigma = (rate * (1 - rate) / total) ** 0.5
    assert abs(frac - rate) < 5 * sigma + 1e-9, (
        f"applied dropout rate {frac:.4f} != configured {rate} "
        f"(n={total}, 5 sigma={5 * sigma:.4f})"
    )
    # inverted scaling: only the FIRST dropout site (edge-MLP h1) sees the
    # same input in both runs (later sites consume already-dropped
    # activations). Identify it by shape — (b, n, n, edge_hidden) with
    # edge_hidden = 2*(2*dim + 1). Tolerance allows XLA FMA discretion
    # between the two expression graphs; a wrong scale would be off by 2x.
    hidden = 2 * (2 * 8 + 1)
    pairs = [
        (np.asarray(d), np.asarray(s))
        for d, s in zip(det_leaves, sto_leaves)
        if np.asarray(d).shape[-1] == hidden
    ]
    assert pairs, "edge-MLP Dropout capture not found"
    for det, sto in pairs:
        kept = (det != 0.0) & (sto != 0.0)
        np.testing.assert_allclose(
            sto[kept], det[kept] / (1.0 - rate), rtol=1e-3, atol=1e-5,
            err_msg="inverted-dropout scaling must be 1/keep",
        )


def _stream_setup(seed=0, b=1, n=12, c=3, hidden=16, m_dim=16):
    ks = jax.random.split(jax.random.PRNGKey(seed), 10)
    coors = jax.random.normal(ks[0], (b, n, c))
    proj = jax.random.normal(ks[1], (b, n, hidden)) * 0.5
    # edge_w2 = identity so the first MLP's dropout is elementwise-observable;
    # coors head maps m_dim -> 4m -> 1 as in the real layer
    params = PairwiseParams(
        w_d=jax.random.normal(ks[2], (1, hidden)) * 0.3,
        edge_w2=jnp.eye(hidden, m_dim),
        edge_b2=jnp.zeros((m_dim,)),
        gate_w=jnp.zeros((m_dim, 1)),
        gate_b=jnp.zeros((1,)),
        coors_w1=jax.random.normal(ks[3], (m_dim, 4 * m_dim)) * 0.3,
        coors_b1=jax.random.normal(ks[4], (4 * m_dim,)) * 0.1,
        coors_w2=jax.random.normal(ks[5], (4 * m_dim, 1)) * 0.3,
        coors_b2=jnp.zeros((1,)),
        cn_scale=jnp.ones((1,)),
    )
    return coors, proj, params, ks


def test_streamed_dropout_edge_mlp_expectation():
    """E over draws of the streamed block's message sum matches the closed
    form keep * silu(silu(h1 / keep)) summed over j — pins rate AND scaling
    of the functional dropout at the edge-MLP position."""
    rate = 0.5
    keep = 1.0 - rate
    coors, proj, params, ks = _stream_setup()

    # deterministic h1 (same computation as pairwise_block)
    rel = coors[:, :, None, :] - coors[:, None, :, :]
    dist = jnp.sum(rel * rel, -1)
    h1 = proj[:, :, None, :] + proj[:, None, :, :] + dist[..., None] @ params.w_d
    expect = (keep * _silu(_silu(h1 / keep))).sum(axis=-2)  # (b, n, m)

    run = jax.jit(lambda r: pairwise_block(
        coors, proj, coors, proj, None, params,
        update_coors=False, update_feats=True,
        dropout_rate=rate, dropout_rng=r,
    )[0])
    K = 400
    acc = 0.0
    for i in range(K):
        acc = acc + run(jax.random.fold_in(ks[6], i))
    mean = np.asarray(acc / K)
    expect = np.asarray(expect)
    # per-element Monte-Carlo noise scales ~ |h1|/sqrt(K); use a scale-aware
    # tolerance on the grand statistics plus a loose elementwise band
    scale = np.abs(expect).mean()
    np.testing.assert_allclose(mean, expect, atol=8 * scale / np.sqrt(K))
    # a mis-applied rate (e.g. keep and rate swapped) shifts the grand mean
    # by far more than the MC noise
    assert abs(mean.mean() - expect.mean()) < 0.5 * scale / np.sqrt(K) * 10


def test_streamed_dropout_coors_mlp_expectation():
    """Closed-form pin for the second dropout site (coors MLP). The messages
    are made CONSTANT w.r.t. the first dropout mask (proj = 0, w_d = 0 makes
    h1 = 0, so drop(h1) = 0 and m_ij = silu(edge_b2) exactly, independent of
    the edge-MLP mask) — then the coordinate update's expectation is exact
    elementwise: E[cw] = keep * silu(z / keep) with z deterministic."""
    rate = 0.3
    keep = 1.0 - rate
    coors, proj, params, ks = _stream_setup(seed=1)
    proj = jnp.zeros_like(proj)
    m_dim = params.edge_w2.shape[-1]
    params = params._replace(
        w_d=jnp.zeros_like(params.w_d),
        edge_b2=jax.random.normal(ks[8], (m_dim,)) * 0.7,
    )

    rel = coors[:, :, None, :] - coors[:, None, :, :]

    run = jax.jit(lambda r: pairwise_block(
        coors, proj, coors, proj, None, params,
        update_coors=True, update_feats=False,
        dropout_rate=rate, dropout_rng=r,
    )[1])
    K = 400
    acc = 0.0
    for i in range(K):
        acc = acc + run(jax.random.fold_in(ks[7], i))
    mean = np.asarray(acc / K)

    # exact expectation: m_ij constant -> z deterministic -> the only
    # randomness is the coors-MLP dropout, elementwise under silu
    m_const = _silu(_silu(jnp.zeros(())) * 0 + params.edge_b2)  # silu(b2)
    z = m_const @ params.coors_w1 + params.coors_b1            # (4m,)
    w_exp = (keep * _silu(z / keep)) @ params.coors_w2 + params.coors_b2
    expect = np.asarray(w_exp[0] * rel.sum(axis=-2))

    scale = np.abs(expect).mean() + 1e-3
    err = np.abs(mean - expect).mean()
    assert err < 8 * scale / np.sqrt(K), (
        f"streamed coors-MLP dropout mean off: {err:.4f} vs scale {scale:.4f}"
    )
