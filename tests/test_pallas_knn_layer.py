"""Fused kNN-layer kernel vs jnp math: outputs and ALL gradients (interpret
mode, CPU). The backward kernel is fully hand-written, so every weight/input
grad is checked against jax.grad of an equivalent jnp pipeline."""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from egnn_tpu.ops.pallas.knn_layer import fused_knn_messages


def _silu(x):
    return x * jax.nn.sigmoid(x)


def _jnp_ref(coors, proj_i, proj_j, idx, pv, weights, *, fourier, soft_edges,
             norm_coors, clamp, eps=1e-8):
    wd, w2, b2, gw, gb, cw1, cb1, cw2, cb2, scale = weights
    from egnn_tpu.ops.core import batched_index_select, fourier_encode_dist

    coors_j = batched_index_select(coors, idx, axis=1)        # (b,n,k,c)
    pj = batched_index_select(proj_j, idx, axis=1)            # (b,n,k,h)
    rel = coors[:, :, None, :] - coors_j
    dist = jnp.sum(rel**2, axis=-1)
    distf = (
        fourier_encode_dist(dist, num_encodings=fourier)
        if fourier else dist[..., None]
    )
    h1 = proj_i[:, :, None, :] + pj + distf @ wd
    m0 = _silu(_silu(h1) @ w2 + b2)
    if soft_edges:
        m0 = m0 * jax.nn.sigmoid(m0 @ gw.reshape(-1, 1) + gb)
    cs = _silu(m0 @ cw1 + cb1)
    wz = (cs @ cw2 + cb2.reshape(1,))[..., 0]                 # (b,n,k)
    pvf = pv.astype(wz.dtype)
    wm = wz * pvf
    w = jnp.clip(wm, -clamp, clamp) if clamp is not None else wm
    if norm_coors:
        nrm = jnp.sqrt(jnp.maximum(dist, eps * eps))[..., None]
        rel_n = rel / nrm * scale
    else:
        rel_n = rel
    cdelta = jnp.einsum("bnk,bnkc->bnc", w, rel_n)
    m_i = (m0 * pvf[..., None]).sum(axis=-2)
    return m_i, cdelta


def _case(seed, b=1, n=160, k=5, c=3, d=8, fourier=0, m=16):
    ks = jax.random.split(jax.random.PRNGKey(seed), 12)
    h = 2 * (2 * d + fourier * 2 + 1)
    dd = 2 * fourier + 1
    coors = jax.random.normal(ks[0], (b, n, c), jnp.float32)
    proj_i = 0.3 * jax.random.normal(ks[1], (b, n, h), jnp.float32)
    proj_j = 0.3 * jax.random.normal(ks[2], (b, n, h), jnp.float32)
    # self-free neighbor indices: a self pair has dist=0, where norm_coors'
    # d(rel/||rel||) ~ scale/eps ~ 1e8 terms cancel exactly in exact math but
    # absorb small contributions differently per summation order — an
    # inherent CoorsNorm property (same in the torch reference), not a
    # kernel defect; it would make f32 grad comparison meaningless here.
    off = jax.random.randint(ks[3], (b, n, k), 1, n)
    idx = (jnp.arange(n)[None, :, None] + off) % n
    pv = jax.random.uniform(ks[4], (b, n, k)) > 0.25
    sc = 0.3
    weights = (
        sc * jax.random.normal(ks[5], (dd, h), jnp.float32),
        sc * jax.random.normal(ks[6], (h, m), jnp.float32),
        sc * jax.random.normal(ks[7], (m,), jnp.float32),
        sc * jax.random.normal(ks[8], (m, 1), jnp.float32),
        jnp.zeros((1,), jnp.float32),
        sc * jax.random.normal(ks[9], (m, 4 * m), jnp.float32),
        sc * jax.random.normal(ks[10], (4 * m,), jnp.float32),
        sc * jax.random.normal(ks[11], (4 * m, 1), jnp.float32),
        jnp.zeros((1,), jnp.float32),
        jnp.asarray([0.9], jnp.float32),
    )
    return coors, proj_i, proj_j, idx, pv.astype(jnp.int32), weights


CASES = [
    dict(fourier=0, soft_edges=False, norm_coors=False, clamp=None),
    dict(fourier=2, soft_edges=False, norm_coors=True, clamp=2.0),
    dict(fourier=0, soft_edges=True, norm_coors=True, clamp=None),
    dict(fourier=4, soft_edges=True, norm_coors=False, clamp=1.0),
]


@pytest.mark.parametrize("case", CASES, ids=[str(i) for i in range(len(CASES))])
def test_fwd_matches(case):
    coors, pi, pj, idx, pv, weights = _case(0, fourier=case["fourier"])
    fused = fused_knn_messages(
        coors, pi, pj, idx, pv, case["fourier"], case["soft_edges"],
        case["norm_coors"], case["clamp"], 1e-8, True, *weights,
    )
    ref = _jnp_ref(coors, pi, pj, idx, pv, weights, **case)
    for a, b_ in zip(fused, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("case", CASES, ids=[str(i) for i in range(len(CASES))])
def test_grads_match(case):
    coors, pi, pj, idx, pv, weights = _case(1, n=128, k=4,
                                            fourier=case["fourier"])
    gm_seed = jax.random.normal(jax.random.PRNGKey(42), (1, 128, 16))
    gc_seed = jax.random.normal(jax.random.PRNGKey(43), (1, 128, 3))

    def loss_fused(coors, pi, pj, *weights):
        m_i, cd = fused_knn_messages(
            coors, pi, pj, idx, pv, case["fourier"], case["soft_edges"],
            case["norm_coors"], case["clamp"], 1e-8, True, *weights,
        )
        return (m_i * gm_seed).sum() + (cd * gc_seed).sum()

    def loss_ref(coors, pi, pj, *weights):
        m_i, cd = _jnp_ref(coors, pi, pj, idx, pv, weights, **case)
        return (m_i * gm_seed).sum() + (cd * gc_seed).sum()

    args = (coors, pi, pj) + weights
    g_fused = jax.grad(loss_fused, argnums=tuple(range(len(args))))(*args)
    g_ref = jax.grad(loss_ref, argnums=tuple(range(len(args))))(*args)
    names = ["coors", "proj_i", "proj_j", "wd", "w2", "b2", "gw", "gb",
             "cw1", "cb1", "cw2", "cb2", "scale"]
    for name, a, b_ in zip(names, g_fused, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=5e-4, atol=5e-5,
            err_msg=f"grad mismatch: {name}",
        )
