"""Pallas segment-sum kernel vs jax.ops.segment_sum (interpret mode, CPU).

Covers unsorted ids, empty segments, padding (E not a multiple of the tile),
out-of-range padded ids (-1), and the custom-vjp gather backward.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from egnn_tpu.ops.pallas.segment import segment_sum_pallas


@pytest.mark.parametrize("e,n,d", [(100, 16, 8), (1024, 64, 16), (777, 33, 5)])
def test_matches_xla(e, n, d):
    rng = np.random.RandomState(e)
    data = jnp.asarray(rng.randn(e, d).astype(np.float32))
    ids = jnp.asarray(rng.randint(0, n, size=(e,)).astype(np.int32))
    out = segment_sum_pallas(data, ids, n, True)
    ref = jax.ops.segment_sum(data, ids, num_segments=n)
    # hi+lo bf16-split matmul accumulation: ~1e-5 abs error vs exact
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_empty_segments_are_zero():
    data = jnp.ones((8, 4), jnp.float32)
    ids = jnp.zeros((8,), jnp.int32)  # everything lands in segment 0
    out = segment_sum_pallas(data, ids, 5, True)
    assert float(out[0, 0]) == 8.0
    np.testing.assert_array_equal(np.asarray(out[1:]), 0.0)


def test_grad_is_gather():
    rng = np.random.RandomState(0)
    data = jnp.asarray(rng.randn(50, 6).astype(np.float32))
    ids = jnp.asarray(rng.randint(0, 10, size=(50,)).astype(np.int32))

    def f(x):
        return (segment_sum_pallas(x, ids, 10, True) ** 2).sum()

    def f_ref(x):
        return (jax.ops.segment_sum(x, ids, num_segments=10) ** 2).sum()

    g = jax.grad(f)(data)
    g_ref = jax.grad(f_ref)(data)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("b,e,n,d", [(4, 512, 64, 16), (3, 100, 16, 5)])
def test_batched_segment_sum_vmapped_kernel(b, e, n, d):
    """The b>1 TPU fast path is a vmapped one-hot kernel (block-diagonal
    per-graph segments); pin it against per-graph XLA references in
    interpret mode, including out-of-range (-1) padded ids."""
    from egnn_tpu.ops.segment import batched_segment_sum

    rng = np.random.RandomState(b * 1000 + e)
    data = jnp.asarray(rng.randn(b, e, d).astype(np.float32))
    ids = rng.randint(0, n, size=(b, e)).astype(np.int32)
    ids[:, -3:] = -1  # padded edges contribute nothing
    ids = jnp.asarray(ids)
    out = batched_segment_sum(data, ids, n, interpret=True)
    ref = jnp.stack([
        jax.ops.segment_sum(data[g], ids[g], num_segments=n)
        for g in range(b)])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_batched_segment_sum_flattened_fallback():
    """b=1 (and unsupported shapes) take the flattened dispatcher path —
    bitwise jax.ops.segment_sum on CPU."""
    from egnn_tpu.ops.segment import batched_segment_sum

    rng = np.random.RandomState(7)
    data = jnp.asarray(rng.randn(1, 200, 9).astype(np.float32))
    ids = jnp.asarray(rng.randint(0, 32, size=(1, 200)).astype(np.int32))
    out = batched_segment_sum(data, ids, 32)
    ref = jax.ops.segment_sum(data[0], ids[0], num_segments=32)[None]
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
