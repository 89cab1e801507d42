"""Ring-parallel (node-sharded) dense path vs the single-device streamed path.

Runs on the 8-virtual-CPU-device mesh from conftest. The ring path must
produce the same layer outputs as the unsharded streamed/materialized path
(up to summation order), and the shard_map train step must match the
unsharded train step.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from egnn_tpu import EGNN, EGNNNetwork
from egnn_tpu.parallel import make_mesh
from egnn_tpu.training import TrainState, make_adam, make_denoise_train_step
from egnn_tpu.training.state import make_ring_denoise_train_step


def _layer_inputs(seed, b, n, d):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    feats = jax.random.normal(ks[0], (b, n, d))
    coors = jax.random.normal(ks[1], (b, n, 3))
    mask = jax.random.uniform(ks[2], (b, n)) > 0.2
    return feats, coors, mask


@pytest.mark.parametrize("with_mask", [True, False])
@pytest.mark.parametrize("pool", ["sum", "mean"])
def test_ring_layer_matches_unsharded(with_mask, pool):
    d, b, n = 8, 2, 32
    feats, coors, mask = _layer_inputs(0, b, n, d)
    if not with_mask:
        mask = None

    ref_layer = EGNN(dim=d, stream_pairwise=True, pairwise_chunk=8,
                     m_pool_method=pool, norm_coors=True)
    params = ref_layer.init(jax.random.PRNGKey(1), feats, coors, mask=mask)
    f_ref, c_ref = jax.jit(ref_layer.apply)(params, feats, coors, mask=mask)

    mesh = make_mesh(data=1, graph=8)
    ring_layer = EGNN(dim=d, ring_axis="graph", m_pool_method=pool,
                      norm_coors=True)

    if mask is None:
        def fwd(p, f, co):
            return ring_layer.apply(p, f, co)
        fwd = jax.shard_map(
            fwd, mesh=mesh,
            in_specs=(P(), P(None, "graph", None), P(None, "graph", None)),
            out_specs=(P(None, "graph", None), P(None, "graph", None)),
            check_vma=False,
        )
        f_ring, c_ring = jax.jit(fwd)(params, feats, coors)
    else:
        def fwd(p, f, co, m):
            return ring_layer.apply(p, f, co, mask=m)
        fwd = jax.shard_map(
            fwd, mesh=mesh,
            in_specs=(P(), P(None, "graph", None), P(None, "graph", None),
                      P(None, "graph")),
            out_specs=(P(None, "graph", None), P(None, "graph", None)),
            check_vma=False,
        )
        f_ring, c_ring = jax.jit(fwd)(params, feats, coors, mask)

    np.testing.assert_allclose(np.asarray(f_ref), np.asarray(f_ring),
                               rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(np.asarray(c_ref), np.asarray(c_ring),
                               rtol=1e-9, atol=1e-9)


def test_ring_train_step_matches_unsharded():
    # 2 data x 4 graph mesh; depth-2 network, no positions / adjacency.
    mesh = make_mesh(data=2, graph=4)
    b, n, dim = 4, 32, 8
    common = dict(depth=2, dim=dim, num_tokens=7)
    net_ref = EGNNNetwork(
        **common, layer_kwargs=dict(stream_pairwise=True, pairwise_chunk=8)
    )
    net_ring = EGNNNetwork(**common, layer_kwargs=dict(ring_axis="graph"))

    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    tokens = jax.random.randint(ks[0], (b, n), 0, 7)
    clean = jax.random.normal(ks[1], (b, n, 3))
    noised = clean + 0.1 * jax.random.normal(ks[2], (b, n, 3))
    mask = jax.random.uniform(ks[3], (b, n)) > 0.2

    params = net_ref.init(jax.random.PRNGKey(1), tokens, noised, mask=mask)["params"]

    # SGD(1.0): the post-step param delta IS the gradient, so the assert
    # compares gradients directly (Adam's eps would amplify summation-order
    # noise on tiny gradients). Separate buffers: both steps donate state.
    import optax
    tx = optax.sgd(1.0)
    state_ref = TrainState.create(jax.tree.map(jnp.copy, params), tx)
    state_ring = TrainState.create(params, tx)

    # unsharded reference step (adj_mat unused by these layer settings)
    ref_step = make_denoise_train_step(net_ref)
    ring_step = make_ring_denoise_train_step(net_ring, mesh)

    dev_put = lambda x, spec: jax.device_put(x, NamedSharding(mesh, spec))
    state_ring = jax.device_put(state_ring, NamedSharding(mesh, P()))
    args = (
        dev_put(tokens, P("data", "graph")),
        dev_put(noised, P("data", "graph", None)),
        dev_put(clean, P("data", "graph", None)),
        dev_put(mask, P("data", "graph")),
    )

    state_ref, loss_ref = ref_step(state_ref, tokens, noised, clean, None, mask)
    state_ring, loss_ring = ring_step(state_ring, *args)

    np.testing.assert_allclose(float(loss_ref), float(loss_ring), rtol=1e-9)
    for a, b_ in zip(
        jax.tree_util.tree_leaves(state_ref.params),
        jax.tree_util.tree_leaves(state_ring.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-6, atol=1e-10)


def test_ring_bf16_matches_streamed_bf16():
    """compute_dtype on the ring path (VERDICT r1 item 3): ring bf16 must
    track the single-device streamed bf16 result (summation order only)."""
    d, b, n = 8, 2, 32
    feats, coors, mask = _layer_inputs(2, b, n, d)
    f32 = lambda x: x.astype(jnp.float32)
    feats, coors = f32(feats), f32(coors)

    ref_layer = EGNN(dim=d, stream_pairwise=True, pairwise_chunk=8,
                     norm_coors=True, compute_dtype=jnp.bfloat16)
    params = jax.tree.map(
        f32, ref_layer.init(jax.random.PRNGKey(1), feats, coors, mask=mask))
    f_ref, c_ref = jax.jit(ref_layer.apply)(params, feats, coors, mask=mask)

    mesh = make_mesh(data=1, graph=8)
    ring_layer = EGNN(dim=d, ring_axis="graph", norm_coors=True,
                      compute_dtype=jnp.bfloat16)

    def fwd(p, f, co, m):
        return ring_layer.apply(p, f, co, mask=m)
    fwd = jax.shard_map(
        fwd, mesh=mesh,
        in_specs=(P(), P(None, "graph", None), P(None, "graph", None),
                  P(None, "graph")),
        out_specs=(P(None, "graph", None), P(None, "graph", None)),
        check_vma=False,
    )
    f_ring, c_ring = jax.jit(fwd)(params, feats, coors, mask)
    np.testing.assert_allclose(np.asarray(f_ref), np.asarray(f_ring),
                               rtol=0, atol=3e-2)
    np.testing.assert_allclose(np.asarray(c_ref), np.asarray(c_ring),
                               rtol=0, atol=3e-2)
