"""Pallas kNN-select kernel vs the jnp reference path (interpret mode, CPU).

The kernel must reproduce ops/neighbors.py's ranking-fill rules and
lax.top_k's lowest-index tie-breaking exactly (ties are the common case: the
self fill -1 and adjacency fill 0 create large tie groups —
egnn_pytorch.py:252-258). Integer-valued coordinates make f32 distances exact
so comparisons are bitwise, not approximate.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from egnn_tpu.ops import neighbors as nb
from egnn_tpu.ops.pallas.knn import knn_select_pallas


def _jnp_reference(coors, k, valid_radius, mask=None, adj_mat=None):
    _, rel_dist = nb.pairwise_geometry(coors)
    ranking = nb.knn_ranking(rel_dist, mask=mask, adj_mat=adj_mat)
    return nb.select_neighborhood(ranking, k, valid_radius)


def _random_case(seed, b, n, c, k, with_mask, with_adj, integer_coords=True):
    rng = np.random.RandomState(seed)
    if integer_coords:
        coors = rng.randint(-8, 8, size=(b, n, c)).astype(np.float32)
    else:
        coors = rng.randn(b, n, c).astype(np.float32)
    mask = rng.rand(b, n) > 0.2 if with_mask else None
    adj = None
    if with_adj:
        adj = np.zeros((b, n, n), dtype=bool)
        ar = np.arange(n)
        adj[:, ar[:-1], ar[1:]] = True
        adj[:, ar[1:], ar[:-1]] = True
        extra = rng.rand(b, n, n) < 0.01
        adj |= extra | np.swapaxes(extra, 1, 2)
        adj[:, ar, ar] = False
    return (
        jnp.asarray(coors),
        jnp.asarray(mask) if mask is not None else None,
        jnp.asarray(adj) if adj is not None else None,
    )


@pytest.mark.parametrize("with_mask", [False, True])
@pytest.mark.parametrize("with_adj", [False, True])
@pytest.mark.parametrize("n,k", [(128, 8), (256, 16), (200, 3)])
def test_matches_jnp_path(with_mask, with_adj, n, k):
    coors, mask, adj = _random_case(
        hash((with_mask, with_adj, n, k)) % 2**31, 2, n, 3, k, with_mask, with_adj
    )
    vals, idx = knn_select_pallas(coors, k, mask=mask, adj_mat=adj, interpret=True)
    ref = _jnp_reference(coors, k, valid_radius=float("inf"), mask=mask, adj_mat=adj)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref.indices))
    np.testing.assert_array_equal(
        np.asarray(vals), np.asarray(ref.ranking, dtype=np.float32)
    )


def test_many_exact_ties():
    # Duplicate coordinates: every distance ties; lowest-index must win.
    coors = jnp.asarray(
        np.tile(np.arange(4)[:, None], (1, 3))[None].repeat(32, axis=0).reshape(1, -1, 3),
        dtype=jnp.float32,
    )  # 128 nodes, 32 copies of each of 4 points
    k = 9
    vals, idx = knn_select_pallas(coors, k, interpret=True)
    ref = _jnp_reference(coors, k, valid_radius=float("inf"))
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref.indices))


def test_higher_dim_coords():
    coors, _, _ = _random_case(7, 1, 160, 5, 6, False, False)
    vals, idx = knn_select_pallas(coors, 6, interpret=True)
    ref = _jnp_reference(coors, 6, valid_radius=float("inf"))
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref.indices))


@pytest.mark.parametrize("ti", [128, 256, 512, 4096])
def test_band_height_knob_bit_identical(ti):
    """The supported tiling knob (band_height param / set_band_height) is
    performance-only: results are bit-identical across heights, and
    non-dividing heights fall back to the default."""
    from egnn_tpu.ops.pallas import knn as K

    coors, mask, adj = _random_case(11, 2, 512, 3, 8, True, True)
    v0, i0 = knn_select_pallas(coors, 8, mask=mask, adj_mat=adj, interpret=True)
    v1, i1 = knn_select_pallas(coors, 8, mask=mask, adj_mat=adj,
                               interpret=True, band_height=ti)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i0))
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v0))
    K.set_band_height(256)
    try:
        v2, i2 = knn_select_pallas(coors, 8, mask=mask, adj_mat=adj,
                                   interpret=True)
        np.testing.assert_array_equal(np.asarray(i2), np.asarray(i0))
    finally:
        K.set_band_height(None)


def test_dispatcher_cpu_fallback_matches():
    coors, mask, adj = _random_case(3, 2, 150, 3, 4, True, True)
    nbhd = nb.knn_select(coors, 4, 0.0, mask=mask, adj_mat=adj)
    ref = _jnp_reference(coors, 4, valid_radius=0.0, mask=mask, adj_mat=adj)
    np.testing.assert_array_equal(np.asarray(nbhd.indices), np.asarray(ref.indices))
    np.testing.assert_array_equal(np.asarray(nbhd.valid), np.asarray(ref.valid))


class TestTiledKernel:
    """j-tiled any-n variant: interpret-mode parity with the jnp ranking
    rules across multiple j-tiles, masks, adjacency, and padding."""

    @pytest.mark.parametrize("n,k,tj,masked,adjd", [
        (512, 8, 128, False, False),
        (512, 8, 128, True, False),
        (384, 4, 128, True, True),
        (300, 3, 128, True, False),   # padded n, multi-tile
        (256, 8, 256, True, False),   # single tile degenerate case
    ])
    def test_tiled_parity(self, n, k, tj, masked, adjd):
        from egnn_tpu.ops.pallas.knn import knn_select_pallas_tiled

        b = 2
        rng = np.random.RandomState(n + k)
        # integer coordinates: f32 distances are exact, so f64-vs-f32
        # ranking comparisons are bitwise (conftest enables x64)
        coors = jnp.asarray(rng.randint(-8, 8, size=(b, n, 3)).astype(np.float64))
        mask = jnp.asarray(rng.rand(b, n) > 0.2) if masked else None
        adj = None
        if adjd:
            ar = jnp.arange(n)
            adj = jnp.broadcast_to(
                jnp.abs(ar[:, None] - ar[None, :]) == 1, (b, n, n))
        ranking = nb.knn_ranking(nb.pairwise_geometry(coors)[1], mask=mask,
                                 adj_mat=adj)
        neg_vals, ref_idx = jax.lax.top_k(-ranking, k)
        v, i = knn_select_pallas_tiled(coors, k, mask=mask, adj_mat=adj,
                                       interpret=True, tj=tj)
        np.testing.assert_array_equal(np.asarray(i), np.asarray(ref_idx))
        np.testing.assert_allclose(np.asarray(v), np.asarray(-neg_vals),
                                   rtol=1e-6)

    def test_tie_order_across_tiles(self):
        # coincident points straddling a tile boundary: winners must keep
        # ascending-column order (running half preferred on equal values)
        from egnn_tpu.ops.pallas.knn import knn_select_pallas_tiled

        n, k, tj = 256, 6, 128
        coors = jnp.zeros((1, n, 3))  # every distance ties at 0
        _, idx = knn_select_pallas_tiled(coors, k, interpret=True, tj=tj)
        ranking = nb.knn_ranking(nb.pairwise_geometry(coors)[1])
        _, ref_idx = jax.lax.top_k(-ranking, k)
        np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref_idx))


@pytest.mark.parametrize("c", [3, 5])
def test_higher_dimension_coords(c):
    """E(n) for n != 3 is a supported feature (reference
    tests/test_equivariance.py:36-45); both kernels must rank c-dimensional
    coordinates identically to the jnp path."""
    from egnn_tpu.ops.pallas.knn import knn_select_pallas_tiled

    coors, mask, adj = _random_case(99 + c, 2, 256, c, 8, True, False)
    ref = _jnp_reference(coors, 8, valid_radius=float("inf"), mask=mask)
    v1, i1 = knn_select_pallas(coors, 8, mask=mask, interpret=True)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(ref.indices))
    v2, i2 = knn_select_pallas_tiled(coors, 8, mask=mask, interpret=True,
                                     tj=128)
    np.testing.assert_array_equal(np.asarray(i2), np.asarray(ref.indices))


# ---------------------------------------------------------------------------
# packed-key candidate kernel + exact refine (knn_select_gather)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("with_mask", [False, True])
@pytest.mark.parametrize("n,k", [(128, 8), (256, 16)])
def test_packed_gather_matches_jnp(with_mask, n, k):
    """Random float coords (ties measure-zero): the packed path must
    reproduce the jnp reference exactly — indices, ranking values, validity
    — and the fused payload gather must equal a plain post-hoc gather."""
    coors, mask, _ = _random_case(
        hash(("packed", with_mask, n, k)) % 2**31, 2, n, 3, k, with_mask,
        False, integer_coords=False,
    )
    payload = jnp.asarray(
        np.random.RandomState(7).randn(2, n, 5).astype(np.float32))
    nbhd, g = nb.knn_select_gather(
        coors, k, valid_radius=2.5, mask=mask, payload=payload,
        backend="packed", interpret=True,
    )
    ref = _jnp_reference(coors, k, valid_radius=2.5, mask=mask)
    np.testing.assert_array_equal(np.asarray(nbhd.indices), np.asarray(ref.indices))
    np.testing.assert_allclose(
        np.asarray(nbhd.ranking), np.asarray(ref.ranking), rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(nbhd.valid), np.asarray(ref.valid))
    width = 3 + (1 if with_mask else 0) + 5
    assert g.shape == (2, n, k, width)
    np.testing.assert_allclose(
        np.asarray(g[..., -5:]),
        np.asarray(jax.vmap(lambda p, i: p[i])(payload, nbhd.indices)),
        rtol=0, atol=0,
    )


@pytest.mark.parametrize("with_mask", [False, True])
def test_packed_tie_pileup_falls_back_exactly(with_mask):
    """Integer-grid coordinates create massive distance-tie groups that
    defeat the truncated-key coverage certificate; the lax.cond fallback
    must kick in and reproduce the exact kernel's output bit-for-bit."""
    n, k = 128, 8
    rng = np.random.RandomState(3)
    # many duplicated points -> many exactly-equal distances
    base = rng.randint(-2, 3, size=(1, 32, 3)).astype(np.float32)
    coors = jnp.asarray(np.tile(base, (1, 4, 1)))
    mask = jnp.asarray(rng.rand(1, n) > 0.3) if with_mask else None
    nbhd, _ = nb.knn_select_gather(
        coors, k, valid_radius=float("inf"), mask=mask,
        backend="packed", interpret=True,
    )
    ref = _jnp_reference(coors, k, valid_radius=float("inf"), mask=mask)
    np.testing.assert_array_equal(np.asarray(nbhd.indices), np.asarray(ref.indices))
    np.testing.assert_allclose(
        np.asarray(nbhd.ranking), np.asarray(ref.ranking), rtol=0, atol=0)


def test_packed_gather_payload_gradients():
    """Payload and coordinate gradients flow through the fused gather;
    selection stays stop-gradient."""
    n, k = 128, 8
    rng = np.random.RandomState(11)
    coors = jnp.asarray(rng.randn(1, n, 3).astype(np.float32))
    payload = jnp.asarray(rng.randn(1, n, 4).astype(np.float32))

    def loss_packed(c, p):
        nbhd, g = nb.knn_select_gather(
            c, k, float("inf"), payload=p, backend="packed", interpret=True)
        return (g ** 2).sum()

    def loss_ref(c, p):
        nbhd = _jnp_reference(c, k, float("inf"))
        table = jnp.concatenate([c, p], axis=-1)
        g = jax.vmap(lambda t, i: t[i])(table, nbhd.indices)
        return (g ** 2).sum()

    gc, gp = jax.grad(loss_packed, argnums=(0, 1))(coors, payload)
    rc, rp = jax.grad(loss_ref, argnums=(0, 1))(coors, payload)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(rp), rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gc), np.asarray(rc), rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------------------
# fused selection + in-kernel payload gather (backend="fused")
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("with_mask", [False, True])
@pytest.mark.parametrize("with_adj", [False, True])
@pytest.mark.parametrize("n,k", [(128, 8), (256, 5)])
def test_fused_gather_matches_jnp(with_mask, with_adj, n, k):
    """backend='fused' (one-hot MXU extraction inside the full-band kernel)
    must reproduce the jnp reference exactly — indices, ranking, validity —
    and the in-kernel payload gather must equal a plain post-hoc gather
    bitwise (one-hot extraction under HIGHEST is exact)."""
    coors, mask, adj = _random_case(
        hash(("fusedg", with_mask, with_adj, n, k)) % 2**31, 2, n, 3, k,
        with_mask, with_adj,
    )
    payload = jnp.asarray(
        np.random.RandomState(5).randn(2, n, 6).astype(np.float32))
    nbhd, g = nb.knn_select_gather(
        coors, k, valid_radius=2.5, mask=mask, adj_mat=adj, payload=payload,
        backend="fused", interpret=True,
    )
    ref = _jnp_reference(coors, k, valid_radius=2.5, mask=mask, adj_mat=adj)
    np.testing.assert_array_equal(np.asarray(nbhd.indices),
                                  np.asarray(ref.indices))
    np.testing.assert_allclose(
        np.asarray(nbhd.ranking), np.asarray(ref.ranking), rtol=1e-6,
        atol=1e-6)
    np.testing.assert_array_equal(np.asarray(nbhd.valid),
                                  np.asarray(ref.valid))
    width = 3 + (1 if with_mask else 0) + 6
    assert g.shape == (2, n, k, width)
    table = jnp.concatenate(
        [coors] + ([mask[..., None].astype(coors.dtype)] if with_mask else [])
        + [payload], axis=-1)
    np.testing.assert_array_equal(
        np.asarray(g),
        np.asarray(jax.vmap(lambda t, i: t[i])(table, nbhd.indices)),
    )


@pytest.mark.parametrize("with_mask,with_adj", [(False, False), (True, True)])
def test_fused_gather_split3_bitwise(with_mask, with_adj):
    """extract='split3' (three DEFAULT bf16-plane dots) must equal
    extract='highest' (one HIGHEST dot) BITWISE: hi+mid+lo is the exact
    3-way bf16 decomposition of f32, and a one-hot left operand makes the
    3 remaining cross terms exact (ops/pallas/knn.py module note). Pinned
    against the plain gather too, including scale extremes (1e-20..1e20
    payload magnitudes exercise the decomposition across exponents)."""
    from egnn_tpu.ops.pallas.knn import knn_select_gather_pallas

    n, k = 256, 7
    coors, mask, adj = _random_case(
        hash(("split3", with_mask, with_adj)) % 2**31, 2, n, 3, k,
        with_mask, with_adj,
    )
    rng = np.random.RandomState(11)
    scale = 10.0 ** rng.uniform(-20, 20, size=(2, n, 1)).astype(np.float32)
    payload = jnp.asarray(rng.randn(2, n, 6).astype(np.float32) * scale)
    table = jnp.concatenate(
        [coors] + ([mask[..., None].astype(coors.dtype)] if with_mask else [])
        + [payload], axis=-1)

    outs = {
        e: knn_select_gather_pallas(
            coors, k, table, mask=mask, adj_mat=adj, interpret=True,
            extract=e)
        for e in ("highest", "split3")
    }
    v_h, i_h, g_h = outs["highest"]
    v_s, i_s, g_s = outs["split3"]
    np.testing.assert_array_equal(np.asarray(i_h), np.asarray(i_s))
    np.testing.assert_array_equal(np.asarray(v_h), np.asarray(v_s))
    np.testing.assert_array_equal(np.asarray(g_h), np.asarray(g_s))
    np.testing.assert_array_equal(
        np.asarray(g_s),
        np.asarray(jax.vmap(lambda t, i: t[i])(table, i_s)))


def test_fused_gather_tie_pileup_exact():
    """Duplicate coordinates (massive tie groups): the fused kernel's
    extraction order must match lax.top_k's lowest-index tie order, and
    each winner's payload row must be the right duplicate's row."""
    n, k = 128, 9
    coors = jnp.asarray(
        np.tile(np.arange(4)[:, None], (1, 3))[None].repeat(32, axis=0)
        .reshape(1, -1, 3), dtype=jnp.float32)
    payload = jnp.asarray(
        np.random.RandomState(2).randn(1, n, 4).astype(np.float32))
    nbhd, g = nb.knn_select_gather(
        coors, k, valid_radius=float("inf"), payload=payload,
        backend="fused", interpret=True)
    ref = _jnp_reference(coors, k, valid_radius=float("inf"))
    np.testing.assert_array_equal(np.asarray(nbhd.indices),
                                  np.asarray(ref.indices))
    table = jnp.concatenate([coors, payload], axis=-1)
    np.testing.assert_array_equal(
        np.asarray(g),
        np.asarray(jax.vmap(lambda t, i: t[i])(table, nbhd.indices)))


def test_fused_gather_payload_gradients():
    """Payload and coordinate gradients flow through the fused gather's
    custom VJP (segment-sum scatter on the saved indices); selection stays
    stop-gradient. Must match the plain-gather reference exactly."""
    n, k = 128, 8
    rng = np.random.RandomState(13)
    coors = jnp.asarray(rng.randn(1, n, 3).astype(np.float32))
    payload = jnp.asarray(rng.randn(1, n, 4).astype(np.float32))

    def loss_fused(c, p):
        nbhd, g = nb.knn_select_gather(
            c, k, float("inf"), payload=p, backend="fused", interpret=True)
        return (g ** 2).sum() + (jnp.sin(g) * g).mean()

    def loss_ref(c, p):
        nbhd = _jnp_reference(c, k, float("inf"))
        table = jnp.concatenate([c, p], axis=-1)
        g = jax.vmap(lambda t, i: t[i])(table, nbhd.indices)
        return (g ** 2).sum() + (jnp.sin(g) * g).mean()

    gc, gp = jax.grad(loss_fused, argnums=(0, 1))(coors, payload)
    rc, rp = jax.grad(loss_ref, argnums=(0, 1))(coors, payload)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(rp),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gc), np.asarray(rc),
                               rtol=1e-5, atol=1e-5)


def test_fused_gather_layer_parity():
    """The full EGNN layer under backend='fused' selection (via the
    FUSED_GATHER_AUTO flag) matches the default path exactly on CPU."""
    from egnn_tpu import EGNN

    layer = EGNN(dim=16, num_nearest_neighbors=8, norm_coors=True,
                 coor_weights_clamp_value=2.0)
    key = jax.random.PRNGKey(0)
    feats = jax.random.normal(key, (1, 128, 16))
    coors = jax.random.normal(jax.random.PRNGKey(1), (1, 128, 3))
    mask = jax.random.uniform(jax.random.PRNGKey(2), (1, 128)) > 0.1
    params = layer.init(key, feats, coors, mask=mask)
    f0, c0 = layer.apply(params, feats, coors, mask=mask)
    try:
        nb.FUSED_GATHER_AUTO = True
        # interpret path engages off-TPU only via backend="fused"; on CPU
        # the auto flag alone must leave results identical (falls through
        # to the jnp path, since on_tpu is False)
        f1, c1 = layer.apply(params, feats, coors, mask=mask)
    finally:
        nb.FUSED_GATHER_AUTO = False
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f0), atol=1e-6)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c0), atol=1e-6)


@pytest.mark.parametrize("with_mask", [False, True])
def test_packed_tiled_gather_matches_jnp(with_mask):
    """The any-n packed-tiled candidate kernel + refine must reproduce the
    jnp reference exactly (random float coords; tj forced small so several
    tiles merge)."""
    from egnn_tpu.ops.pallas.knn import knn_candidates_packed_tiled

    n, k, kc = 512, 8, 8 + nb.CANDIDATE_SLACK
    coors, mask, _ = _random_case(
        hash(("ptiled", with_mask)) % 2**31, 2, n, 3, k, with_mask, False,
        integer_coords=False,
    )
    keys, cols = knn_candidates_packed_tiled(
        coors, kc, mask=mask, interpret=True, tj=128)
    ref = _jnp_reference(coors, k, valid_radius=float("inf"), mask=mask)
    # coverage certificate (with the masked-fill sentinel exemption, as the
    # dispatcher applies it) holds on random floats, which guarantees the
    # exact top-k is CONTAINED in the kc candidates (order within
    # truncated-key ties differs by design — the caller's exact refine
    # restores it, see test_packed_tiled_select_gather_end_to_end)
    from egnn_tpu.ops.pallas.knn import PACKED_MASK_SENTINEL_TILED

    ok = np.asarray(
        (keys[..., kc - 1] > keys[..., k - 1])
        | (keys[..., k - 1] >= PACKED_MASK_SENTINEL_TILED)
    )
    assert ok.all()
    cset = np.asarray(cols)
    rset = np.asarray(ref.indices)
    b, n = rset.shape[:2]
    for bb in range(b):
        for i in range(n):
            assert set(rset[bb, i]) <= set(cset[bb, i]), (bb, i)
    # keys are non-decreasing per row
    assert (np.diff(np.asarray(keys), axis=-1) >= 0).all()


def test_packed_tiled_select_gather_end_to_end():
    from egnn_tpu.ops.pallas import knn as pk
    n, k = 512, 8
    coors, mask, _ = _random_case(11, 1, n, 3, k, True, False,
                                  integer_coords=False)
    payload = jnp.asarray(
        np.random.RandomState(8).randn(1, n, 4).astype(np.float32))
    nbhd, g = nb.knn_select_gather(
        coors, k, valid_radius=3.0, mask=mask, payload=payload,
        backend="packed_tiled", interpret=True,
    )
    ref = _jnp_reference(coors, k, valid_radius=3.0, mask=mask)
    np.testing.assert_array_equal(np.asarray(nbhd.indices), np.asarray(ref.indices))
    np.testing.assert_allclose(np.asarray(nbhd.ranking), np.asarray(ref.ranking),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(nbhd.valid), np.asarray(ref.valid))
    assert g.shape == (1, n, k, 3 + 1 + 4)


def test_packed_tiled_tie_pileup_falls_back():
    base = np.random.RandomState(5).randint(-2, 3, size=(1, 64, 3)).astype(np.float32)
    coors = jnp.asarray(np.tile(base, (1, 4, 1)))
    nbhd, _ = nb.knn_select_gather(
        coors, 8, float("inf"), backend="packed_tiled", interpret=True,
    )
    ref = _jnp_reference(coors, 8, float("inf"))
    np.testing.assert_array_equal(np.asarray(nbhd.indices), np.asarray(ref.indices))


# ---------------------------------------------------------------------------
# packed-tiled j-tile divisibility (every column must be scanned)
# ---------------------------------------------------------------------------


def test_packed_tiled_tj_always_divides():
    """The chosen j-tile must divide the (lane-padded) n — a non-dividing tj
    silently drops the tail columns from the candidate scan, which the
    coverage certificate cannot detect."""
    from egnn_tpu.ops.pallas.knn import (
        _MERGE_TILE_BITS, _TCOL_BITS, _packed_tiled_tj)

    for n in [128, 1280, 12288, 16384, 65536, 262144, 17024, 9600, 66048]:
        tj = _packed_tiled_tj(n)
        if tj is not None:
            assert n % tj == 0, (n, tj)
            assert n // tj <= (1 << _MERGE_TILE_BITS), (n, tj)
            assert tj <= (1 << _TCOL_BITS), (n, tj)
    # odd-part > 64: no dividing power-of-two tile reaches nj <= 64
    assert _packed_tiled_tj(17024) is None    # 128 * 133
    assert _packed_tiled_tj(66048) is None    # 128 * 516 = 2^9 * 129
    # caller-forced small tj grows only while divisibility holds
    assert _packed_tiled_tj(16384, 128) == 256  # nj 128 -> grown to 64
    assert _packed_tiled_tj(12288, 4096) == 4096  # 3 tiles, fine as-is


def test_supports_packed_tiled_rejects_undividable_shapes():
    """Shapes whose lane-padded size has odd part > 64 must be rejected so
    the dispatcher falls back to the exact tiled kernel (which handles any
    lane-padded n)."""
    from egnn_tpu.ops.pallas.knn import supports_pallas_knn_packed_tiled

    assert supports_pallas_knn_packed_tiled(12200, 20, backend="tpu")
    assert supports_pallas_knn_packed_tiled(262144, 20, backend="tpu")
    # 17000 pads to 17024 = 128*133 -> no valid tile decomposition
    assert not supports_pallas_knn_packed_tiled(17000, 20, backend="tpu")
    assert not supports_pallas_knn_packed_tiled(17024, 20, backend="tpu")
    # beyond 64*4096 the 6-bit tile index can't reach either
    assert not supports_pallas_knn_packed_tiled(262145, 20, backend="tpu")


@pytest.mark.parametrize("with_mask", [False, True])
def test_packed_tiled_non_power_of_two_n(with_mask):
    """Non-power-of-two n with a lane-padding tail: the padded columns in
    the last tile must be excluded and every REAL column scanned (the
    round-2 growth loop dropped tail columns for such shapes)."""
    from egnn_tpu.ops.pallas.knn import knn_candidates_packed_tiled

    n, k = 1210, 8          # pads to 1280 = 2^8 * 5 (non-power-of-two)
    kc = k + nb.CANDIDATE_SLACK
    coors, mask, _ = _random_case(
        hash(("ptile-np2", with_mask)) % 2**31, 1, n, 3, k, with_mask, False,
        integer_coords=False,
    )
    keys, cols = knn_candidates_packed_tiled(
        coors, kc, mask=mask, interpret=True, tj=128)  # 10 j-tiles
    ref = _jnp_reference(coors, k, valid_radius=float("inf"), mask=mask)
    cset = np.asarray(cols)
    rset = np.asarray(ref.indices)
    for i in range(n):
        assert set(rset[0, i]) <= set(cset[0, i]), i
    # no padded column (>= n) ever appears among real-keyed candidates
    from egnn_tpu.ops.pallas.knn import PACKED_MASK_SENTINEL_TILED
    real = np.asarray(keys) < PACKED_MASK_SENTINEL_TILED
    assert (cset[real] < n).all()


# ---------------------------------------------------------------------------
# WIDE packed path: kc slots + winner mask, no compaction (round 3)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("with_mask", [False, True])
@pytest.mark.parametrize("backend", ["packed", "packed_tiled"])
def test_wide_winner_mask_matches_reference(with_mask, backend):
    """wide=True returns kc slots + a winner mask; the winner SET, their
    ranking values, the validity set, and winner-masked aggregates must all
    equal the compacted reference (aggregation is order-invariant, so slot
    order need not match top_k order)."""
    n, k = 256, 8
    kc = k + nb.CANDIDATE_SLACK
    coors, mask, _ = _random_case(
        hash(("wide", with_mask, backend)) % 2**31, 2, n, 3, k, with_mask,
        False, integer_coords=False,
    )
    payload = jnp.asarray(
        np.random.RandomState(17).randn(2, n, 5).astype(np.float32))
    nbhd, g = nb.knn_select_gather(
        coors, k, valid_radius=2.5, mask=mask, payload=payload,
        backend=backend, interpret=True, wide=True,
    )
    ref = _jnp_reference(coors, k, valid_radius=2.5, mask=mask)

    assert nbhd.indices.shape == (2, n, kc)
    assert nbhd.winner is not None and nbhd.winner.shape == (2, n, kc)
    w = np.asarray(nbhd.winner)
    assert (w.sum(-1) == k).all()

    idx = np.asarray(nbhd.indices)
    rk = np.asarray(nbhd.ranking)
    vd = np.asarray(nbhd.valid)
    ridx = np.asarray(ref.indices)
    rrk = np.asarray(ref.ranking)
    rvd = np.asarray(ref.valid)
    for bi in range(2):
        for i in range(n):
            assert set(idx[bi, i][w[bi, i]].tolist()) == set(ridx[bi, i].tolist())
            # winner ranking multiset matches
            np.testing.assert_allclose(
                np.sort(rk[bi, i][w[bi, i]]), np.sort(rrk[bi, i]),
                rtol=1e-6, atol=1e-6)
            # validity set (indices where valid) matches
            assert (set(idx[bi, i][vd[bi, i]].tolist())
                    == set(ridx[bi, i][rvd[bi, i]].tolist()))

    # winner-masked payload aggregate == compacted reference aggregate
    gp = np.asarray(g[..., -5:])
    agg_wide = (gp * w[..., None]).sum(axis=2)
    ref_rows = np.asarray(
        jax.vmap(lambda p, i: p[i])(payload, ref.indices))
    np.testing.assert_allclose(agg_wide, ref_rows.sum(axis=2),
                               rtol=1e-5, atol=1e-5)


def test_wide_tie_pileup_fallback_winner_is_prefix():
    """Certificate-rejecting tie pileups: the wide path's fallback marks the
    exact kernel's k slots (the kc-pad prefix) as winners."""
    n, k = 128, 8
    rng = np.random.RandomState(3)
    base = rng.randint(-2, 3, size=(1, 32, 3)).astype(np.float32)
    coors = jnp.asarray(np.tile(base, (1, 4, 1)))
    nbhd, _ = nb.knn_select_gather(
        coors, k, float("inf"), backend="packed", interpret=True, wide=True,
    )
    ref = _jnp_reference(coors, k, float("inf"))
    w = np.asarray(nbhd.winner)
    kc = k + nb.CANDIDATE_SLACK
    assert (w == (np.arange(kc) < k)[None, None]).all()
    np.testing.assert_array_equal(
        np.asarray(nbhd.indices[..., :k]), np.asarray(ref.indices))


def test_wide_boundary_tie_group_exact():
    """Construct rows whose k-th and (k+1)-th candidates tie in the COARSE
    key but differ in exact rank: the winner mask must resolve the boundary
    by exact (rank, column) order, not candidate order."""
    n, k = 128, 4
    rng = np.random.RandomState(9)
    coors_np = rng.randn(1, n, 3).astype(np.float32) * 2
    # make nodes 100..103 almost-equidistant from node 0: identical coarse
    # key (perturb in the 9th+ mantissa bit), distinct exact distances
    base = coors_np[0, 0] + np.asarray([2.0, 0.0, 0.0], np.float32)
    for t, eps in enumerate([3e-6, 1e-6, 2e-6, 0.0]):
        coors_np[0, 100 + t] = base + np.asarray([eps, 0, 0], np.float32)
    coors = jnp.asarray(coors_np)
    nbhd, _ = nb.knn_select_gather(
        coors, k, float("inf"), backend="packed", interpret=True, wide=True)
    ref = _jnp_reference(coors, k, float("inf"))
    w = np.asarray(nbhd.winner)
    idx = np.asarray(nbhd.indices)
    ridx = np.asarray(ref.indices)
    for i in range(n):
        assert set(idx[0, i][w[0, i]].tolist()) == set(ridx[0, i].tolist()), i


@pytest.mark.parametrize("ti", [128, 256])
def test_row_band_height_invariance(ti):
    """bench.py's autotune probes the full-band kernel at overridden row-band
    heights (ti=1024 arm): selection must be bit-identical across ti — the
    band height is pure tiling. Pin that invariance (and the bench helper's
    restore semantics, now backed by the kernel's supported set_band_height
    knob) at two heights against the default."""
    import bench

    coors, mask, adj = _random_case(21, 2, 256, 3, 8, True, True)
    base_v, base_i = knn_select_pallas(coors, 8, mask=mask, adj_mat=adj,
                                       interpret=True)
    from egnn_tpu.ops.pallas import knn as K
    try:
        bench._set_knn_ti(ti)
        assert K._effective_ti(256, None) == (ti if 256 % ti == 0
                                              else K._pick_ti(256))
        v, i = knn_select_pallas(coors, 8, mask=mask, adj_mat=adj,
                                 interpret=True)
        np.testing.assert_array_equal(np.asarray(i), np.asarray(base_i))
        np.testing.assert_array_equal(np.asarray(v), np.asarray(base_v))
    finally:
        bench._set_knn_ti(None)
    assert K._effective_ti(256, None) == K._pick_ti(256)
