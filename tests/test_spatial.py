"""Grid-pruned kNN (ops/spatial.py) vs the exact masked selection: whenever
the certificate passes, values, indices AND tie order must equal
ops/neighbors.knn_select; adversarial inputs must fail the certificate
rather than return silently wrong results."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from egnn_tpu.ops.neighbors import knn_select
from egnn_tpu.ops.spatial import grid_knn_select


def _exact(coors, k, mask=None):
    nb = knn_select(coors, k, float("inf"), mask=mask)
    return np.asarray(nb.ranking), np.asarray(nb.indices)


@pytest.mark.parametrize("seed,b,n,k,with_mask", [
    (0, 1, 1024, 8, False),
    (1, 2, 2048, 16, False),
    (2, 1, 1024, 8, True),
    (3, 1, 1000, 5, True),   # non-power-of-two
])
def test_grid_knn_matches_exact_when_certified(seed, b, n, k, with_mask):
    key = jax.random.PRNGKey(seed)
    coors = jax.random.uniform(key, (b, n, 3), jnp.float32) * 10.0
    mask = ((jax.random.uniform(jax.random.PRNGKey(seed + 9), (b, n)) > 0.15)
            if with_mask else None)
    vals, idx, ok, _rx = grid_knn_select(coors, k, mask=mask)
    assert bool(ok), "uniform data should certify"
    evals, eidx = _exact(coors, k, mask)
    np.testing.assert_array_equal(np.asarray(idx), eidx)
    np.testing.assert_allclose(np.asarray(vals), evals, rtol=1e-6, atol=1e-6)


def test_grid_knn_certificate_rejects_duplicate_pileup():
    """Mass-duplicated coordinates create cell overflow and boundary ties —
    the certificate must fail (results then come from the exact fallback in
    the caller), never silently diverge."""
    base = np.random.RandomState(0).rand(8, 3).astype(np.float32)
    coors = jnp.asarray(np.tile(base, (512, 1)))[None]   # 4096 nodes, 8 sites
    vals, idx, ok, _rx = grid_knn_select(coors, 4)
    assert not bool(ok)


def test_grid_knn_statically_uncertifiable_shapes_reject():
    """k too large for any 27-block population, or a grid too coarse for
    corner blocks to cover (gdim < 4): reject statically."""
    key = jax.random.PRNGKey(1)
    coors = jax.random.uniform(key, (1, 128, 3), jnp.float32)
    _, _, ok, _rx = grid_knn_select(coors, 64, occupancy=1.0, m_cap=1)
    assert not bool(ok)
    # n=512 at default occupancy -> gdim 3 -> static reject
    coors = jax.random.uniform(key, (1, 512, 3), jnp.float32)
    _, _, ok, _rx = grid_knn_select(coors, 8)
    assert not bool(ok)


def test_grid_knn_masked_rows_match_exact_fill():
    key = jax.random.PRNGKey(2)
    coors = jax.random.uniform(key, (1, 2048, 3), jnp.float32) * 4.0
    mask = jnp.ones((1, 2048), bool).at[0, :190].set(False)
    vals, idx, ok, _rx = grid_knn_select(coors, 6, mask=mask)
    assert bool(ok)
    evals, eidx = _exact(coors, 6, mask)
    np.testing.assert_array_equal(np.asarray(idx), eidx)
    np.testing.assert_allclose(np.asarray(vals), evals, rtol=1e-6)


def test_grid_knn_under_jit_and_anisotropy():
    """Mild anisotropy certifies; extreme anisotropy must be REJECTED by
    the certificate (cell counts are static under jit, so per-axis cell
    edges stretch with the box and a needle box makes the 27-block
    non-covering — the caller's exact fallback handles it)."""
    key = jax.random.PRNGKey(3)
    base = jax.random.uniform(key, (1, 4096, 3), jnp.float32)
    mild = base * jnp.asarray([3.0, 1.0, 2.0])
    # anisotropy stretches cells with the box: the binding margin is the
    # SMALLEST axis edge while the kth-NN radius follows the geometric
    # mean, so the default occupancy needs a (geomean/min)^3 boost here
    vals, idx, ok, _rx = jax.jit(
        lambda c: grid_knn_select(c, 8, occupancy=6.0 * 12.0))(mild)
    assert bool(ok), "mild anisotropy should certify with boosted occupancy"
    evals, eidx = _exact(mild, 8)
    np.testing.assert_array_equal(np.asarray(idx), eidx)

    needle = base * jnp.asarray([100.0, 1.0, 0.01])
    _, _, ok, _rx = jax.jit(lambda c: grid_knn_select(c, 8))(needle)
    assert not bool(ok), "needle box must fail the certificate, not lie"


# ---- knn_select(backend="grid") dispatch integration ----

def test_knn_select_grid_backend_matches_auto():
    key = jax.random.PRNGKey(7)
    coors = jax.random.uniform(key, (2, 1024, 3), jnp.float32) * 5.0
    mask = jax.random.uniform(jax.random.PRNGKey(8), (2, 1024)) > 0.1
    a = knn_select(coors, 8, 2.0, mask=mask, backend="auto")
    g = knn_select(coors, 8, 2.0, mask=mask, backend="grid")
    np.testing.assert_array_equal(np.asarray(g.indices), np.asarray(a.indices))
    np.testing.assert_allclose(np.asarray(g.ranking), np.asarray(a.ranking),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(g.valid), np.asarray(a.valid))


def test_knn_select_grid_backend_fallback_on_adversarial():
    """Duplicate pileups fail the certificate; the lax.cond fallback must
    return the exact selection anyway."""
    base = np.random.RandomState(3).rand(8, 3).astype(np.float32)
    coors = jnp.asarray(np.tile(base, (512, 1)))[None]
    a = knn_select(coors, 4, float("inf"), backend="auto")
    g = knn_select(coors, 4, float("inf"), backend="grid")
    np.testing.assert_array_equal(np.asarray(g.indices), np.asarray(a.indices))
    np.testing.assert_allclose(np.asarray(g.ranking),
                               np.asarray(a.ranking), rtol=1e-6)


def test_knn_select_grid_backend_payload_gather():
    from egnn_tpu.ops.neighbors import knn_select_gather
    key = jax.random.PRNGKey(9)
    coors = jax.random.uniform(key, (1, 1024, 3), jnp.float32) * 5.0
    feats = jax.random.normal(jax.random.PRNGKey(10), (1, 1024, 6), jnp.float32)
    na, ga = knn_select_gather(coors, 8, float("inf"), payload=feats,
                               backend="auto")
    ng, gg = knn_select_gather(coors, 8, float("inf"), payload=feats,
                               backend="grid")
    np.testing.assert_array_equal(np.asarray(ng.indices), np.asarray(na.indices))
    np.testing.assert_allclose(np.asarray(gg), np.asarray(ga), rtol=1e-6)


def test_grid_certificate_rejects_masked_fill_regime():
    """The exact path ranks masked pairs AT the 1e5 fill, so when the kth
    REAL neighbor distance exceeds 1e5 the exact selection prefers masked
    pairs the grid tables exclude — the certificate must reject (and the
    dispatch fallback must then match auto exactly)."""
    key = jax.random.PRNGKey(11)
    # box side 5000 -> typical nn d^2 ~ (5000/10)^2 = 2.5e5 > 1e5 at n=1024
    coors = jax.random.uniform(key, (1, 1024, 3), jnp.float32) * 5000.0
    mask = jax.random.uniform(jax.random.PRNGKey(12), (1, 1024)) > 0.1
    vals, idx, ok, _rx = grid_knn_select(coors, 8, mask=mask)
    assert not bool(ok), "kth distance >= 1e5 with a mask must not certify"
    a = knn_select(coors, 8, float("inf"), mask=mask, backend="auto")
    g = knn_select(coors, 8, float("inf"), mask=mask, backend="grid")
    np.testing.assert_array_equal(np.asarray(g.indices), np.asarray(a.indices))
    # sanity: exact top-k here really does contain masked senders
    masked_ids = set(np.nonzero(~np.asarray(mask[0]))[0].tolist())
    sel = set(np.asarray(a.indices[0]).reshape(-1).tolist())
    assert masked_ids & sel, "regime check: exact selection uses masked fills"


@pytest.mark.parametrize("seed", range(12))
def test_grid_fuzz_certified_means_exact(seed):
    """Property fuzz: across random shapes/scales/masks, a passing
    certificate ALWAYS implies exact (idx, val) equality — certified-but-
    wrong is the one unacceptable failure mode."""
    rng = np.random.RandomState(seed)
    n = int(rng.choice([777, 1024, 1536, 2048]))
    k = int(rng.choice([4, 8, 13]))
    scale = float(rng.choice([0.01, 1.0, 40.0]))
    key = jax.random.PRNGKey(seed)
    coors = jax.random.uniform(key, (1, n, 3), jnp.float32) * scale
    mask = None
    if rng.rand() < 0.5:
        mask = jax.random.uniform(jax.random.PRNGKey(seed + 99), (1, n)) > 0.2
    vals, idx, ok, _rx = grid_knn_select(coors, k, mask=mask)
    if bool(ok):
        evals, eidx = _exact(coors, k, mask)
        np.testing.assert_array_equal(np.asarray(idx), eidx)
        np.testing.assert_allclose(np.asarray(vals), evals, rtol=1e-6,
                                   atol=1e-6)
    # either way the dispatch must equal auto (fallback covers rejections)
    a = knn_select(coors, k, float("inf"), mask=mask, backend="auto")
    g = knn_select(coors, k, float("inf"), mask=mask, backend="grid")
    np.testing.assert_array_equal(np.asarray(g.indices), np.asarray(a.indices))


def test_grid_dispatch_mixed_certifiability_batch():
    """b=3 with one clustered element: the per-call certificate rejects the
    whole call and the dispatch fallback must still equal auto exactly."""
    key = jax.random.PRNGKey(21)
    uni = jax.random.uniform(key, (2, 1024, 3), jnp.float32) * 10.0
    gauss = jax.random.normal(jax.random.PRNGKey(22), (1, 1024, 3),
                              jnp.float32) * 10.0
    coors = jnp.concatenate([uni, gauss], axis=0)
    a = knn_select(coors, 8, float("inf"), backend="auto")
    g = knn_select(coors, 8, float("inf"), backend="grid")
    np.testing.assert_array_equal(np.asarray(g.indices), np.asarray(a.indices))
    np.testing.assert_allclose(np.asarray(g.ranking), np.asarray(a.ranking),
                               rtol=1e-6)


@pytest.mark.parametrize("n,k", [(1024, 8), (2048, 8)])
def test_grid_integer_lattice_ties(n, k):
    """Integer-lattice clouds tie in almost every distance comparison (the
    deep-fuzz family the other tests lack): the grid path must either
    reject, or match the exact selection's indices AND tie order; the
    dispatch fallback must equal auto either way."""
    rng = np.random.RandomState(n + k)
    side = max(2, int(round(n ** (1 / 3))))
    coors = jnp.asarray(
        rng.randint(0, side, size=(1, n, 3)).astype(np.float32))
    vals, idx, ok, _rx = grid_knn_select(coors, k)
    if bool(ok):
        evals, eidx = _exact(coors, k)
        np.testing.assert_array_equal(np.asarray(idx), eidx)
        np.testing.assert_allclose(np.asarray(vals), evals, rtol=1e-6,
                                   atol=1e-6)
    a = knn_select(coors, k, float("inf"), backend="auto")
    g = knn_select(coors, k, float("inf"), backend="grid")
    np.testing.assert_array_equal(np.asarray(g.indices), np.asarray(a.indices))


def test_window_tier_cascade_exact(monkeypatch):
    """Grid backend exactness on clustered data through the repair-tier
    cond ladder in interpret mode. NOTE: at this n the jnp grid path
    rejects every row (cells too coarse), so the ladder resolves to the
    exact whole-call fallback — the WINDOW tier + r_tiny cascade branches
    themselves only engage at n >= 16384 and are exactness-gated ON-CHIP
    by benchmarks/grid_route_check.py's auto == exact assertions on
    Gaussian clouds (16k/65k); this test pins the ladder's cond plumbing
    (window gate dropped) still routes to a correct branch under
    interpret."""
    from egnn_tpu.ops import neighbors as nb

    monkeypatch.setattr(nb, "_WINDOW_REPAIR_MIN_N", 0)
    rng = np.random.RandomState(17)
    # tight clusters + sparse halo: heterogeneous equal-mass cells
    centers = rng.randn(8, 3).astype(np.float32) * 4.0
    pts = np.concatenate(
        [c + 0.05 * rng.randn(56, 3).astype(np.float32) for c in centers]
        + [6.0 * rng.randn(64, 3).astype(np.float32)], axis=0)
    coors = jnp.asarray(pts)[None]
    k = 8
    g = knn_select(coors, k, float("inf"), backend="grid", interpret=True)
    a = knn_select(coors, k, float("inf"), backend="jnp")
    np.testing.assert_array_equal(np.asarray(g.indices), np.asarray(a.indices))
    np.testing.assert_allclose(np.asarray(g.ranking), np.asarray(a.ranking),
                               rtol=1e-6, atol=1e-6)
