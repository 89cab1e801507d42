"""Aux-subsystem tests: sanitizers, metric logging, graph helpers, packaging
surface (SURVEY.md §5 — tracing/sanitizers/metrics are framework components,
not extras)."""
import json

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from egnn_tpu.ops import backbone_covalent_bonds, chain_adjacency
from egnn_tpu.parallel import MetricLogger, initialize, is_coordinator, log0
from egnn_tpu.training import TrainState
from egnn_tpu.utils import (
    assert_in_bounds,
    checked,
    finite_or_skip_step,
    guard_finite,
    tree_all_finite,
)


def test_guard_finite_raises():
    def f(x):
        y = x / x  # NaN at 0
        guard_finite(y, "y")
        return y

    cf = checked(f)
    cf(jnp.ones((4,)))  # fine
    with pytest.raises(Exception, match="non-finite"):
        cf(jnp.zeros((4,)))


def test_assert_in_bounds():
    def f(idx):
        assert_in_bounds(idx, 10, "edge")
        return idx

    cf = checked(f)
    cf(jnp.array([0, 9]))
    with pytest.raises(Exception, match="out of bounds"):
        cf(jnp.array([0, 10]))


def test_finite_or_skip_step():
    params = {"w": jnp.ones((3,))}
    state = TrainState.create(params, optax.sgd(1.0))

    def bad_step(state, x):
        grads = {"w": jnp.full((3,), jnp.nan) * x}
        return state.apply_gradients(grads), jnp.asarray(jnp.nan)

    def good_step(state, x):
        grads = {"w": jnp.ones((3,)) * x}
        return state.apply_gradients(grads), jnp.asarray(1.0)

    s2, loss = jax.jit(finite_or_skip_step(bad_step))(state, 1.0)
    np.testing.assert_array_equal(np.asarray(s2.params["w"]), 1.0)  # kept
    assert np.isnan(float(loss))

    s3, loss = jax.jit(finite_or_skip_step(good_step))(state, 1.0)
    np.testing.assert_array_equal(np.asarray(s3.params["w"]), 0.0)  # applied
    assert float(loss) == 1.0


def test_tree_all_finite():
    assert bool(tree_all_finite({"a": jnp.ones(3), "b": jnp.zeros(2)}))
    assert not bool(tree_all_finite({"a": jnp.array([1.0, jnp.inf])}))


def test_metric_logger(tmp_path):
    initialize()  # single-host no-op
    assert is_coordinator()
    log0("coordinator log line works")
    path = tmp_path / "metrics.jsonl"
    ml = MetricLogger(str(path))
    ml.log(0, loss=1.5, edges_per_s=1e6)
    ml.log(1, loss=jnp.asarray(0.5))
    # device-array records are buffered (no per-step device sync), host
    # scalars are written immediately
    assert len(ml._pending) == 1
    assert len(path.read_text().splitlines()) == 1
    ml.close()  # close flushes the deferred records via one batched fetch
    recs = [json.loads(l) for l in path.read_text().splitlines()]
    assert recs[0]["loss"] == 1.5 and recs[1]["step"] == 1
    assert recs[1]["loss"] == 0.5


def test_backbone_covalent_bonds():
    nr, a = 5, 3
    es = backbone_covalent_bonds(nr, a)
    assert es.senders.shape[0] == 2 * (nr * (a - 1) + nr - 1)
    pairs = set(zip(np.asarray(es.senders).tolist(), np.asarray(es.receivers).tolist()))
    # peptide bond C(0)=atom2 -> N(1)=atom3, both directions
    assert (2, 3) in pairs and (3, 2) in pairs
    # intra-residue N-CA of residue 0
    assert (0, 1) in pairs and (1, 0) in pairs
    # no self loops, all in bounds
    s, r = np.asarray(es.senders), np.asarray(es.receivers)
    assert (s != r).all() and s.max() < nr * a and r.max() < nr * a
    assert (np.diff(r) >= 0).all()  # receiver-major invariant


def test_chain_adjacency_matches_reference_example():
    adj = np.asarray(chain_adjacency(5))
    expect = np.zeros((5, 5), bool)
    for i in range(4):
        expect[i, i + 1] = expect[i + 1, i] = True
    np.testing.assert_array_equal(adj, expect)


def test_prefetch_loader_sharded_delivery():
    """PrefetchLoader with a NamedSharding: the worker thread's device_put
    must deliver batches already sharded over the mesh (the multichip input
    pipeline — host graph build lands directly in the right shards)."""
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from egnn_tpu.parallel import make_mesh
    from egnn_tpu.training.data import PrefetchLoader

    mesh = make_mesh(data=1, graph=8)
    sharding = NamedSharding(mesh, P("graph"))
    rng = np.random.RandomState(0)

    loader = PrefetchLoader(lambda: rng.randn(64, 4), num_batches=3,
                            sharding=sharding)
    batches = list(loader)
    loader.close()
    assert len(batches) == 3
    for b in batches:
        assert b.shape == (64, 4)
        assert b.sharding == sharding
        assert len(b.addressable_shards) == 8


def test_prefetch_loader_worker_error_surfaces():
    from egnn_tpu.training.data import PrefetchLoader

    def boom():
        raise ValueError("bad batch")

    loader = PrefetchLoader(boom, num_batches=2)
    with pytest.raises(RuntimeError, match="worker failed"):
        next(iter(loader))
    loader.close()


def test_fused_adam_matches_optax():
    """make_fused_adam (flat-buffer moments) computes the same Adam math as
    optax.adam; trajectories must track to float-reordering tolerance."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax
    from egnn_tpu.training import TrainState, make_fused_adam

    params = {
        "a": {"w": jnp.array([[0.5, -1.0], [2.0, 0.1]], jnp.float32),
              "b": jnp.zeros((2,), jnp.float32)},
        "c": jnp.array([3.0, -0.2, 0.7], jnp.float32),
    }

    def loss(p):
        return (p["a"]["w"] ** 2).sum() + jnp.abs(p["a"]["b"] - 1.0).sum() + (
            jnp.sin(p["c"]) ** 2).sum()

    s_ref = TrainState.create(params, optax.adam(3e-2))
    s_fused = TrainState.create(params, make_fused_adam(3e-2))

    @jax.jit
    def step(st):
        return st.apply_gradients(jax.grad(loss)(st.params))

    for _ in range(25):
        s_ref, s_fused = step(s_ref), step(s_fused)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5),
        s_fused.params, s_ref.params)
