"""Pipeline parallelism (parallel/pipeline.py): output and gradient parity
vs the sequential depth stack, on a virtual 'pipe' mesh (CPU, conftest's
8 virtual devices)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from egnn_tpu import EGNN
from egnn_tpu.parallel.pipeline import (
    make_pipelined_apply, stack_layer_params, to_stages)

S, DEPTH, B, M, N, DIM = 4, 8, 8, 4, 32, 16


def _mesh():
    return Mesh(np.array(jax.devices()[:S]), ("pipe",))


def _setup(mask=False):
    layer = EGNN(dim=DIM, num_nearest_neighbors=4, norm_coors=True,
                 coor_weights_clamp_value=2.0)
    key = jax.random.PRNGKey(0)
    feats = jax.random.normal(key, (B, N, DIM))
    coors = jax.random.normal(jax.random.PRNGKey(1), (B, N, 3))
    msk = (jax.random.uniform(jax.random.PRNGKey(2), (B, N)) > 0.2) if mask else None
    stacked = stack_layer_params(layer, jax.random.PRNGKey(3),
                                 feats[:1], coors[:1], DEPTH, mask=None)
    return layer, stacked, feats, coors, msk


def _sequential(layer, stacked, feats, coors, mask):
    def body(fc, p):
        f, c = layer.apply({"params": p}, fc[0], fc[1], mask=mask)
        return (f, c), None
    (f, c), _ = jax.lax.scan(body, (feats, coors), stacked)
    return f, c


@pytest.mark.parametrize("use_mask", [False, True])
def test_pipeline_output_parity(use_mask):
    layer, stacked, feats, coors, msk = _setup(use_mask)
    f_ref, c_ref = _sequential(layer, stacked, feats, coors, msk)
    pp = make_pipelined_apply(layer, _mesh(), M)
    f_pp, c_pp = pp(to_stages(stacked, S), feats, coors, mask=msk)
    np.testing.assert_allclose(f_pp, f_ref, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(c_pp, c_ref, rtol=1e-5, atol=1e-6)


def test_pipeline_gradient_parity():
    layer, stacked, feats, coors, _ = _setup(False)
    pp = make_pipelined_apply(layer, _mesh(), M)

    def loss_seq(p, f, c):
        fo, co = _sequential(layer, p, f, c, None)
        return (fo ** 2).mean() + (co ** 2).mean()

    def loss_pp(p, f, c):
        fo, co = pp(to_stages(p, S), f, c)
        return (fo ** 2).mean() + (co ** 2).mean()

    lr, gr = jax.value_and_grad(loss_seq, argnums=(0,))(stacked, feats, coors)
    lp, gp = jax.value_and_grad(loss_pp, argnums=(0,))(stacked, feats, coors)
    np.testing.assert_allclose(lp, lr, rtol=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-6),
        gp[0], gr[0])
    # input grads flow through the ring too
    gi_r = jax.grad(loss_seq, argnums=2)(stacked, feats, coors)
    gi_p = jax.grad(loss_pp, argnums=2)(stacked, feats, coors)
    np.testing.assert_allclose(gi_p, gi_r, rtol=2e-4, atol=1e-6)


def test_pipeline_stage_param_shapes():
    layer, stacked, *_ = _setup(False)
    st = to_stages(stacked, S)
    leaf = jax.tree_util.tree_leaves(st)[0]
    assert leaf.shape[:2] == (S, DEPTH // S)


@pytest.mark.parametrize("use_mask", [False, True])
def test_pipeline_streaming_loss_parity(use_mask):
    """Round-5 streaming-loss collection (scalar accumulator, one scalar
    psum): must equal the sequential stack's mean-over-microbatches loss,
    with matching per-stage param grads and input grads."""
    from egnn_tpu.parallel.pipeline import make_pipelined_loss

    layer, stacked, feats, coors, msk = _setup(use_mask)
    target = coors + 0.1

    def mb_loss(fo, co, tgt, m):
        err = (co - tgt) ** 2
        if m is not None:
            err = err * m[..., None]
        return err.mean() + (fo ** 2).mean()

    pl_loss = make_pipelined_loss(layer, _mesh(), M, mb_loss)

    def loss_seq(p, f, c):
        # sequential reference: mean of per-microbatch losses
        mb = f.shape[0] // M
        tot = 0.0
        for i in range(M):
            sl = slice(i * mb, (i + 1) * mb)
            fo, co = _sequential(layer, p, f[sl], c[sl],
                                 msk[sl] if msk is not None else None)
            tot = tot + mb_loss(fo, co, target[sl],
                                msk[sl] if msk is not None else None)
        return tot / M

    def loss_pp(p, f, c):
        return pl_loss(to_stages(p, S), f, c, target, mask=msk)

    lr, gr = jax.value_and_grad(loss_seq)(stacked, feats, coors)
    lp, gp = jax.value_and_grad(loss_pp)(stacked, feats, coors)
    np.testing.assert_allclose(lp, lr, rtol=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-6),
        gp, gr)
    gi_r = jax.grad(loss_seq, argnums=2)(stacked, feats, coors)
    gi_p = jax.grad(loss_pp, argnums=2)(stacked, feats, coors)
    np.testing.assert_allclose(gi_p, gi_r, rtol=2e-4, atol=1e-6)
