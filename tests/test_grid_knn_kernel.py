"""Interpret-mode parity for the grid-blocked kNN kernel
(ops/pallas/grid_knn.py): whenever the certificate passes, (vals, idx)
must equal the exact masked selection INCLUDING tie order; adversarial
inputs must fail the certificate rather than silently diverge."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from egnn_tpu.ops.neighbors import knn_select
from egnn_tpu.ops.pallas.grid_knn import (
    grid_kernel_gdim,
    grid_knn_select_pallas,
    supports_grid_knn,
)


def _exact(coors, k, mask=None):
    nb = knn_select(coors, k, float("inf"), mask=mask)
    return np.asarray(nb.ranking), np.asarray(nb.indices)


@pytest.mark.parametrize("seed,b,n,k,gdim,with_mask", [
    (0, 1, 1024, 8, 4, False),
    (1, 2, 1024, 8, 4, True),
    (2, 1, 2048, 16, 4, False),
    (3, 1, 1000, 5, 4, True),    # non-power-of-two n
])
def test_grid_kernel_matches_exact_when_certified(seed, b, n, k, gdim,
                                                  with_mask):
    key = jax.random.PRNGKey(seed)
    coors = jax.random.uniform(key, (b, n, 3), jnp.float32) * 10.0
    mask = ((jax.random.uniform(jax.random.PRNGKey(seed + 9), (b, n)) > 0.1)
            if with_mask else None)
    vals, idx, ok, _rx = grid_knn_select_pallas(
        coors, k, mask=mask, interpret=True, gdim=gdim)
    assert bool(ok), "uniform data should certify"
    evals, eidx = _exact(coors, k, mask)
    np.testing.assert_array_equal(np.asarray(idx), eidx)
    np.testing.assert_allclose(np.asarray(vals), evals, rtol=1e-6, atol=1e-6)


def test_grid_kernel_duplicate_pileup_exact_or_rejected():
    """Co-located duplicates are pure tie stress: with in-kernel (dist,
    gid) lex selection they are EXACT when cells hold them (no rejection
    needed); beyond m_cap slots the overflow early-exit must reject."""
    base = np.random.RandomState(0).rand(8, 3).astype(np.float32)
    coors = jnp.asarray(np.tile(base, (128, 1)))[None]   # 128/cell == m_cap
    vals, idx, ok, _rx = grid_knn_select_pallas(coors, 4, interpret=True, gdim=4)
    assert bool(ok), "ties alone must not reject"
    evals, eidx = _exact(coors, 4)
    np.testing.assert_array_equal(np.asarray(idx), eidx)
    np.testing.assert_allclose(np.asarray(vals), evals, rtol=0, atol=0)

    coors2 = jnp.asarray(np.tile(base, (256, 1)))[None]  # 256/cell > m_cap
    _, _, ok2, _rx2 = grid_knn_select_pallas(coors2, 4, interpret=True, gdim=4)
    assert not bool(ok2), "cell overflow must reject (early exit)"


def test_grid_kernel_under_jit():
    coors = jax.random.uniform(jax.random.PRNGKey(5), (1, 1024, 3),
                               jnp.float32) * 3.0
    vals, idx, ok, _rx = jax.jit(
        lambda c: grid_knn_select_pallas(c, 8, interpret=True, gdim=4))(coors)
    assert bool(ok)
    evals, eidx = _exact(coors, 8)
    np.testing.assert_array_equal(np.asarray(idx), eidx)


def test_supports_grid_knn_window():
    # occupancy model: supported sizes keep mean cell population <= _OCC_MAX
    # and the table VMEM-resident
    assert not supports_grid_knn(4096, 8, backend="tpu")      # n too small
    assert supports_grid_knn(8192, 16, backend="tpu")
    assert supports_grid_knn(16384, 16, backend="tpu")
    assert supports_grid_knn(65536, 16, backend="tpu")
    assert not supports_grid_knn(16384, 16, backend="cpu")
    g = grid_kernel_gdim(16384)
    assert 16384 / g**3 <= 96.0


@pytest.mark.parametrize("seed", range(4))
def test_grid_kernel_fuzz_certified_means_exact(seed):
    rng = np.random.RandomState(seed)
    n = int(rng.choice([900, 1024, 1500]))
    k = int(rng.choice([4, 8]))
    key = jax.random.PRNGKey(seed + 40)
    coors = jax.random.uniform(key, (1, n, 3), jnp.float32) * 7.0
    mask = None
    if rng.rand() < 0.5:
        mask = jax.random.uniform(jax.random.PRNGKey(seed + 77), (1, n)) > 0.2
    vals, idx, ok, _rx = grid_knn_select_pallas(
        coors, k, mask=mask, interpret=True, gdim=4)
    if bool(ok):
        evals, eidx = _exact(coors, k, mask)
        np.testing.assert_array_equal(np.asarray(idx), eidx)
        np.testing.assert_allclose(np.asarray(vals), evals, rtol=1e-6,
                                   atol=1e-6)


def test_grid_kernel_exact_through_boundary_ties():
    """Integer-lattice clouds have massive EXACT f32 distance ties (6
    axis-neighbors at d^2=1): selection must match top_k's lowest-gid
    tie-break and still CERTIFY (ties are resolved by (dist, gid) lex
    in-kernel, not rejected)."""
    g = 10
    ax = np.arange(g, dtype=np.float32)
    xx, yy, zz = np.meshgrid(ax, ax, ax, indexing="ij")
    coors = jnp.asarray(
        np.stack([xx, yy, zz], -1).reshape(1, g**3, 3))      # n=1000
    vals, idx, ok, _rx = grid_knn_select_pallas(coors, 4, interpret=True, gdim=4)
    assert bool(ok), "lattice ties must not be rejected"
    evals, eidx = _exact(coors, 4)
    np.testing.assert_array_equal(np.asarray(idx), eidx)
    np.testing.assert_allclose(np.asarray(vals), evals, rtol=0, atol=0)


def test_grid_kernel_early_skip_on_clustered_data():
    """Gaussian clouds overflow the uniform grid's core cells; the early
    certificate must reject (ok=False). n=2048 at gdim=4 puts ~12% of the
    mass (~246 nodes) in the central cell — always > M_CAP=128."""
    coors = jax.random.normal(jax.random.PRNGKey(5), (1, 2048, 3),
                              jnp.float32) * 10.0
    _, _, ok, _rx = grid_knn_select_pallas(coors, 8, interpret=True, gdim=4)
    assert not bool(ok), "core-cell overflow must early-reject"


def test_grid_kernel_early_skip_on_isolated_cluster():
    """The candidate-count early component: a remote 4-point cluster whose
    27-block holds only itself cannot supply k=8 candidates — reject."""
    key = jax.random.PRNGKey(7)
    bulk = jax.random.uniform(key, (1, 1020, 3), jnp.float32)  # [0,1]^3
    far = jnp.asarray([[100.0, 100.0, 100.0]]) + jax.random.uniform(
        jax.random.PRNGKey(8), (1, 4, 3), jnp.float32) * 0.01
    coors = jnp.concatenate([bulk, far], axis=1)
    _, _, ok, _rx = grid_knn_select_pallas(coors, 8, interpret=True, gdim=4)
    assert not bool(ok), "ncand < k must early-reject"


@pytest.mark.parametrize("seed,n,k,with_mask", [
    (0, 1024, 8, False),
    (1, 1000, 5, True),
])
def test_grid_kernel_streamed_matches_exact(seed, n, k, with_mask):
    """The streamed-table variant (grid (G, 27), arithmetic index maps,
    band scratch) must produce the identical certified result."""
    key = jax.random.PRNGKey(seed)
    coors = jax.random.uniform(key, (1, n, 3), jnp.float32) * 10.0
    mask = ((jax.random.uniform(jax.random.PRNGKey(seed + 9), (1, n)) > 0.1)
            if with_mask else None)
    vals, idx, ok, _rx = grid_knn_select_pallas(
        coors, k, mask=mask, interpret=True, gdim=4, streamed=True)
    assert bool(ok)
    evals, eidx = _exact(coors, k, mask)
    np.testing.assert_array_equal(np.asarray(idx), eidx)
    np.testing.assert_allclose(np.asarray(vals), evals, rtol=1e-6, atol=1e-6)


def test_grid_kernel_streamed_lattice_ties():
    g = 10
    ax = np.arange(g, dtype=np.float32)
    xx, yy, zz = np.meshgrid(ax, ax, ax, indexing="ij")
    coors = jnp.asarray(np.stack([xx, yy, zz], -1).reshape(1, g**3, 3))
    vals, idx, ok, _rx = grid_knn_select_pallas(
        coors, 4, interpret=True, gdim=4, streamed=True)
    assert bool(ok)
    evals, eidx = _exact(coors, 4)
    np.testing.assert_array_equal(np.asarray(idx), eidx)


def test_grid_kernel_exact_at_extreme_coordinate_offsets():
    """Box-relative sentinels: data living near what a fixed absolute
    sentinel coordinate would be (1e9) must still be certified-and-exact —
    empty slots may never masquerade as neighbors."""
    key = jax.random.PRNGKey(6)
    base = jax.random.uniform(key, (1, 1024, 3), jnp.float32)
    # box [0.99e9, 1.01e9]: wide enough that f32 still resolves the cloud
    # (ulp at 1e9 is 64), centered where the old absolute sentinel lived
    coors = base * 2e7 + 0.99e9
    vals, idx, ok, _rx = grid_knn_select_pallas(coors, 8, interpret=True, gdim=4)
    assert bool(ok), "offset clouds should certify"
    evals, eidx = _exact(coors, 8)
    np.testing.assert_array_equal(np.asarray(idx), eidx)

    # beyond the scale guard: reject, never lie
    _, _, ok2, _rx2 = grid_knn_select_pallas(coors * 1e7, 8, interpret=True, gdim=4)
    assert not bool(ok2)


def test_query_kernel_matches_exact_rows():
    """Asymmetric query-vs-points kernel (the bucketed repair engine):
    its rows must be BITWISE the exact selection's rows, with and without
    masks, including tie order."""
    from egnn_tpu.ops.pallas.knn import knn_select_queries_pallas

    key = jax.random.PRNGKey(7)
    b, n, k, R = 2, 300, 6, 40
    coors = jax.random.normal(key, (b, n, 3), jnp.float32) * 3.0
    mask = jax.random.uniform(jax.random.PRNGKey(8), (b, n)) > 0.15
    fidx = jax.random.randint(jax.random.PRNGKey(9), (b, R), 0, n)
    q = jnp.take_along_axis(coors, fidx[..., None], axis=1)
    for m in (None, mask):
        qm = None if m is None else jnp.take_along_axis(m, fidx, axis=1)
        rv, ri = jax.jit(lambda qq, cc: knn_select_queries_pallas(
            qq, cc, k, q_mask=qm, p_mask=m, interpret=True))(q, coors)
        ref = knn_select(coors, k, float("inf"), mask=m)
        ev = jnp.take_along_axis(ref.ranking, fidx[..., None], axis=1)
        ei = jnp.take_along_axis(ref.indices, fidx[..., None], axis=1)
        np.testing.assert_array_equal(np.asarray(ri), np.asarray(ei))
        # values: XLA's FMA-fusion discretion moves the last ulp between
        # different expression graphs of the same math — indices and tie
        # order are the exactness contract, values are tolerance-checked
        # (same policy as the certified grid tests above)
        np.testing.assert_allclose(np.asarray(rv), np.asarray(ev),
                                   rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("with_mask", [False, True])
def test_grid_repair_path_is_exact_on_clustered_clouds(with_mask):
    """End-to-end dispatch on CLUSTERED (Gaussian) clouds: equal-mass
    binning certifies most rows, the margin-failing boundary sliver is
    repaired by the query kernel, and the merged result must equal the
    exact selection bit-for-bit. Non-vacuous: assert some rows actually
    failed row-level certification (so the repair branch, not _take_grid,
    produced the output)."""
    b, n, k = 1, 1024, 8
    coors = jax.random.normal(jax.random.PRNGKey(11), (b, n, 3),
                              jnp.float32) * 10.0
    mask = (jax.random.uniform(jax.random.PRNGKey(12), (b, n)) > 0.1
            if with_mask else None)
    # non-vacuous: the dispatcher routes this size to the jnp grid path —
    # confirm on that SAME path that some rows fail row-level certification
    # within the repair bucket, so the repair branch (not _take_grid, not
    # the whole-call fallback) produces the output below
    from egnn_tpu.ops.spatial import grid_knn_select
    _, _, ok, row_exact = grid_knn_select(coors, k, mask=mask)
    n_bad = int(jnp.sum(~row_exact))
    assert not bool(ok) and 0 < n_bad <= max(128, n // 8), (
        f"fixture must exercise the repair bucket (n_bad={n_bad})")

    got = knn_select(coors, k, float("inf"), mask=mask, backend="grid",
                     interpret=True)
    ref = knn_select(coors, k, float("inf"), mask=mask)
    np.testing.assert_array_equal(np.asarray(got.indices),
                                  np.asarray(ref.indices))
    np.testing.assert_allclose(np.asarray(got.ranking),
                               np.asarray(ref.ranking), rtol=1e-6, atol=1e-6)


def test_window_kernel_full_width_matches_exact_rows():
    """Windowed repair kernel with a full-width window: every row's margin
    is infinite (both window ends at the array boundary), so every row is
    certified and must match the exact selection bitwise (indices/ties;
    values at the FMA tolerance)."""
    from egnn_tpu.ops.pallas.knn import knn_select_window_pallas

    key = jax.random.PRNGKey(17)
    b, n, k, R = 2, 256, 6, 64
    coors = jax.random.normal(key, (b, n, 3), jnp.float32) * 3.0
    mask = jax.random.uniform(jax.random.PRNGKey(18), (b, n)) > 0.15
    for m in (None, mask):
        c32 = coors.astype(jnp.float32)
        xkey = jnp.where(m, c32[..., 0], jnp.float32("inf")) if m is not None \
            else c32[..., 0]
        order = jnp.argsort(xkey, axis=1).astype(jnp.int32)
        pts_s = jnp.take_along_axis(c32, order[..., None], axis=1)
        pm_s = jnp.take_along_axis(m, order, axis=1) if m is not None else None
        rank = jax.vmap(lambda oo: jnp.zeros((n,), jnp.int32).at[oo].set(
            jnp.arange(n, dtype=jnp.int32)))(order)
        # queries: VALID rows only (the repair contract)
        valid = jnp.ones((b, n), bool) if m is None else m
        _, fidx = jax.lax.top_k(valid.astype(jnp.float32), R)
        q = jnp.take_along_axis(c32, fidx[..., None], axis=1)
        qranks = jnp.take_along_axis(rank, fidx, axis=1)
        rv, ri, margin = jax.jit(lambda qq, rr, pp: knn_select_window_pallas(
            qq, rr, pp, order, k, n, p_mask_sorted=pm_s, interpret=True))(
                q, qranks, pts_s)
        assert bool(jnp.all(jnp.isinf(margin))), "full window => inf margins"
        ref = knn_select(coors, k, float("inf"), mask=m)
        ev = jnp.take_along_axis(ref.ranking, fidx[..., None], axis=1)
        ei = jnp.take_along_axis(ref.indices, fidx[..., None], axis=1)
        np.testing.assert_array_equal(np.asarray(ri), np.asarray(ei))
        np.testing.assert_allclose(np.asarray(rv), np.asarray(ev),
                                   rtol=1e-6, atol=1e-6)


def test_window_kernel_partial_window_certificate():
    """Partial (W = n/4) windows: rows the margin certificate accepts must
    match the exact selection bitwise; the certificate must actually accept
    a nontrivial share (clustered queries near their own x-neighborhood)."""
    from egnn_tpu.ops.pallas.knn import knn_select_window_pallas

    b, n, k, W = 1, 2048, 8, 512
    coors = jax.random.normal(jax.random.PRNGKey(19), (b, n, 3),
                              jnp.float32)  # unit Gaussian: tight kNN radii
    c32 = coors.astype(jnp.float32)
    order = jnp.argsort(c32[..., 0], axis=1).astype(jnp.int32)
    pts_s = jnp.take_along_axis(c32, order[..., None], axis=1)
    rank = jax.vmap(lambda oo: jnp.zeros((n,), jnp.int32).at[oo].set(
        jnp.arange(n, dtype=jnp.int32)))(order)
    R = 256
    fidx = jax.lax.top_k(
        jax.random.uniform(jax.random.PRNGKey(20), (b, n)), R)[1]
    # sort the bucket by x-rank (the dispatch does the same) so tile
    # windows cover their rows
    qranks_all = jnp.take_along_axis(rank, fidx, axis=1)
    ordq = jnp.argsort(qranks_all, axis=1)
    fidx = jnp.take_along_axis(fidx, ordq, axis=1)
    q = jnp.take_along_axis(c32, fidx[..., None], axis=1)
    qranks = jnp.take_along_axis(rank, fidx, axis=1)
    rv, ri, margin = knn_select_window_pallas(
        q, qranks, pts_s, order, k, W, interpret=True)
    cert = np.asarray(rv[:, :, k - 1] < margin * margin)
    assert cert.mean() > 0.5, f"certificate pass rate too low: {cert.mean()}"
    ref = knn_select(coors, k, float("inf"))
    ev = np.asarray(jnp.take_along_axis(ref.ranking, fidx[..., None], axis=1))
    ei = np.asarray(jnp.take_along_axis(ref.indices, fidx[..., None], axis=1))
    np.testing.assert_array_equal(np.asarray(ri)[cert], ei[cert])
    np.testing.assert_allclose(np.asarray(rv)[cert], ev[cert],
                               rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("with_mask", [False, True])
def test_windowed_repair_dispatch_exact_on_clustered_clouds(with_mask):
    """End-to-end grid dispatch with the tier-0 WINDOWED repair engaged
    (gate lowered for CPU): clustered cloud, some rows fail row-level
    certification, the windowed tier repairs them, and the merged result
    must equal the exact selection bit-for-bit."""
    from egnn_tpu.ops import neighbors as nbm

    b, n, k = 1, 1024, 8
    coors = jax.random.normal(jax.random.PRNGKey(21), (b, n, 3),
                              jnp.float32) * 10.0
    mask = (jax.random.uniform(jax.random.PRNGKey(22), (b, n)) > 0.1
            if with_mask else None)
    from egnn_tpu.ops.spatial import grid_knn_select
    _, _, ok, row_exact = grid_knn_select(coors, k, mask=mask)
    n_bad = int(jnp.sum(~row_exact))
    assert not bool(ok) and 0 < n_bad <= max(128, n // 8), (
        f"fixture must exercise the repair bucket (n_bad={n_bad})")

    old = nbm._WINDOW_REPAIR_MIN_N
    try:
        nbm._WINDOW_REPAIR_MIN_N = 0
        got = knn_select(coors, k, float("inf"), mask=mask, backend="grid",
                         interpret=True)
    finally:
        nbm._WINDOW_REPAIR_MIN_N = old
    ref = knn_select(coors, k, float("inf"), mask=mask)
    np.testing.assert_array_equal(np.asarray(got.indices),
                                  np.asarray(ref.indices))
    np.testing.assert_allclose(np.asarray(got.ranking),
                               np.asarray(ref.ranking), rtol=1e-6, atol=1e-6)
