"""Activation-level parity vs the torch reference implementation.

The reference package (read-only at /root/reference) is imported as a test
*oracle*: identical weights are injected into both implementations and outputs
are compared allclose in float64. This pins our numerics to the reference's
exact semantics (BASELINE.md correctness baseline).

Skipped automatically if torch or the reference checkout are unavailable.
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

# Install the minimal PyG stand-in BEFORE the reference package imports
# (egnn_pytorch/__init__ pulls in the sparse module, whose PyG fallback
# otherwise leaves EGNN_Sparse unconstructible) — see tests/_pyg_shim.py.
from _pyg_shim import install as _install_pyg_shim

_install_pyg_shim()

REFERENCE_PATH = "/root/reference"
if REFERENCE_PATH not in sys.path:
    sys.path.insert(0, REFERENCE_PATH)

try:
    from egnn_pytorch.egnn_pytorch import EGNN as TorchEGNN
    from egnn_pytorch.egnn_pytorch import EGNN_Network as TorchEGNNNetwork

    HAVE_REF = True
except Exception:  # pragma: no cover
    HAVE_REF = False

from egnn_tpu import EGNN, EGNNNetwork

pytestmark = pytest.mark.skipif(not HAVE_REF, reason="reference not importable")

torch.set_default_dtype(torch.float64)


# the public migration utility IS the injection mechanism under test
from egnn_tpu.utils.port_weights import (
    egnn_network_params_from_torch,
    egnn_params_from_torch,
)

inject_egnn_params = egnn_params_from_torch


def _compare_layer(torch_layer, jax_layer, feats, coors, edges=None, mask=None,
                   adj_mat=None, atol=1e-9):
    tkw = {}
    if edges is not None:
        tkw["edges"] = torch.tensor(np.asarray(edges))
    if mask is not None:
        tkw["mask"] = torch.tensor(np.asarray(mask))
    if adj_mat is not None:
        tkw["adj_mat"] = torch.tensor(np.asarray(adj_mat))
    with torch.no_grad():
        tf, tc = torch_layer(
            torch.tensor(np.asarray(feats)), torch.tensor(np.asarray(coors)), **tkw
        )

    params = {"params": inject_egnn_params(torch_layer)}
    jf, jc = jax_layer.apply(params, feats, coors, edges=edges, mask=mask, adj_mat=adj_mat)

    np.testing.assert_allclose(jf, tf.numpy(), atol=atol, rtol=1e-7)
    np.testing.assert_allclose(jc, tc.numpy(), atol=atol, rtol=1e-7)


def test_parity_dense_allpairs():
    torch.manual_seed(0)
    key = jax.random.PRNGKey(0)
    keys = jax.random.split(key, 4)
    feats = jax.random.normal(keys[0], (2, 16, 64))
    coors = jax.random.normal(keys[1], (2, 16, 3))
    edges = jax.random.normal(keys[2], (2, 16, 16, 4))
    mask = jnp.arange(16)[None, :] < jnp.array([[16], [13]])

    tl = TorchEGNN(dim=64, edge_dim=4)
    jl = EGNN(dim=64, edge_dim=4)
    _compare_layer(tl, jl, feats, coors, edges, mask)


def test_parity_dense_fourier_norm():
    torch.manual_seed(1)
    key = jax.random.PRNGKey(1)
    keys = jax.random.split(key, 3)
    feats = jax.random.normal(keys[0], (1, 12, 32))
    coors = jax.random.normal(keys[1], (1, 12, 3))

    tl = TorchEGNN(dim=32, fourier_features=4, norm_coors=True, norm_feats=True,
                   m_pool_method="mean", soft_edges=True,
                   coor_weights_clamp_value=2.0)
    jl = EGNN(dim=32, fourier_features=4, norm_coors=True, norm_feats=True,
              m_pool_method="mean", soft_edges=True,
              coor_weights_clamp_value=2.0)
    _compare_layer(tl, jl, feats, coors)


def test_parity_dense_knn():
    """kNN path on random coords (no distance ties -> identical selection)."""
    torch.manual_seed(2)
    key = jax.random.PRNGKey(2)
    keys = jax.random.split(key, 4)
    feats = jax.random.normal(keys[0], (1, 64, 32))
    coors = jax.random.normal(keys[1], (1, 64, 3))
    edges = jax.random.normal(keys[2], (1, 64, 64, 2))
    mask = jnp.arange(64)[None, :] < 60

    tl = TorchEGNN(dim=32, edge_dim=2, num_nearest_neighbors=8)
    jl = EGNN(dim=32, edge_dim=2, num_nearest_neighbors=8)
    _compare_layer(tl, jl, feats, coors, edges, mask)


def test_parity_dense_knn_valid_radius():
    torch.manual_seed(3)
    key = jax.random.PRNGKey(3)
    keys = jax.random.split(key, 2)
    feats = jax.random.normal(keys[0], (1, 32, 16))
    coors = 2.0 * jax.random.normal(keys[1], (1, 32, 3))
    mask = jnp.ones((1, 32), dtype=bool)

    tl = TorchEGNN(dim=16, num_nearest_neighbors=6, valid_radius=2.5)
    jl = EGNN(dim=16, num_nearest_neighbors=6, valid_radius=2.5)
    _compare_layer(tl, jl, feats, coors, mask=mask)


def test_parity_mean_pool_no_mask():
    torch.manual_seed(4)
    key = jax.random.PRNGKey(4)
    keys = jax.random.split(key, 2)
    feats = jax.random.normal(keys[0], (1, 10, 16))
    coors = jax.random.normal(keys[1], (1, 10, 3))
    tl = TorchEGNN(dim=16, m_pool_method="mean")
    jl = EGNN(dim=16, m_pool_method="mean")
    _compare_layer(tl, jl, feats, coors)


def inject_network_params(torch_net, depth) -> dict:
    return egnn_network_params_from_torch(torch_net)


def test_parity_network_full():
    """EGNN_Network end-to-end: tokens, positions, adjacency degrees + adj
    embedding, global linear attention — untested in the reference, pinned here."""
    torch.manual_seed(5)
    depth = 3
    n = 24
    tnet = TorchEGNNNetwork(
        depth=depth,
        dim=32,
        num_tokens=21,
        num_positions=n,
        num_adj_degrees=2,
        adj_dim=4,
        global_linear_attn_every=2,
        global_linear_attn_heads=2,
        global_linear_attn_dim_head=8,
        num_nearest_neighbors=6,
        coor_weights_clamp_value=2.0,
        norm_coors=True,
    )
    jnet = EGNNNetwork(
        depth=depth,
        dim=32,
        num_tokens=21,
        num_positions=n,
        num_adj_degrees=2,
        adj_dim=4,
        global_linear_attn_every=2,
        global_linear_attn_heads=2,
        global_linear_attn_dim_head=8,
        layer_kwargs=dict(
            num_nearest_neighbors=6, coor_weights_clamp_value=2.0, norm_coors=True
        ),
    )

    key = jax.random.PRNGKey(5)
    keys = jax.random.split(key, 3)
    feats = jax.random.randint(keys[0], (2, n), 0, 21)
    coors = jax.random.normal(keys[1], (2, n, 3))
    ar = jnp.arange(n)
    adj = jnp.abs(ar[:, None] - ar[None, :]) == 1
    mask = jnp.arange(n)[None, :] < jnp.array([[n], [n - 4]])

    with torch.no_grad():
        tf, tc = tnet(
            torch.tensor(np.asarray(feats)),
            torch.tensor(np.asarray(coors)),
            adj_mat=torch.tensor(np.asarray(adj)),
            mask=torch.tensor(np.asarray(mask)),
        )

    params = {"params": inject_network_params(tnet, depth)}
    jf, jc = jnet.apply(params, feats, coors, adj_mat=adj, mask=mask)

    np.testing.assert_allclose(jf, tf.numpy(), atol=1e-8, rtol=1e-6)
    np.testing.assert_allclose(jc, tc.numpy(), atol=1e-8, rtol=1e-6)


def test_parity_only_sparse_neighbors_with_adj_degrees():
    """BASELINE.md anchor config 4: only_sparse_neighbors + chain adjacency,
    num_adj_degrees=3, adj_dim=8 (README.md:97-120) — network-level parity."""
    torch.manual_seed(7)
    n, depth = 20, 2
    tnet = TorchEGNNNetwork(
        depth=depth, dim=16, num_tokens=9,
        num_adj_degrees=3, adj_dim=8,
        only_sparse_neighbors=True,
    )
    jnet = EGNNNetwork(
        depth=depth, dim=16, num_tokens=9,
        num_adj_degrees=3, adj_dim=8,
        layer_kwargs=dict(only_sparse_neighbors=True),
    )
    key = jax.random.PRNGKey(7)
    keys = jax.random.split(key, 2)
    feats = jax.random.randint(keys[0], (1, n), 0, 9)
    coors = jax.random.normal(keys[1], (1, n, 3))
    ar = jnp.arange(n)
    adj = jnp.abs(ar[:, None] - ar[None, :]) == 1

    with torch.no_grad():
        tf, tc = tnet(
            torch.tensor(np.asarray(feats)),
            torch.tensor(np.asarray(coors)),
            adj_mat=torch.tensor(np.asarray(adj)),
        )
    params = {"params": inject_network_params(tnet, depth)}
    jf, jc = jnet.apply(params, feats, coors, adj_mat=adj)
    np.testing.assert_allclose(jf, tf.numpy(), atol=1e-8, rtol=1e-6)
    np.testing.assert_allclose(jc, tc.numpy(), atol=1e-8, rtol=1e-6)


@pytest.mark.parametrize("seed", range(8))
def test_parity_fuzzed_option_combinations(seed):
    """Randomized sweeps over the EGNN option surface, compared against the
    torch reference with injected weights — parity must hold for ANY legal
    kwarg combination, not just the hand-picked configs above."""
    rng = np.random.RandomState(1000 + seed)
    n = int(rng.choice([10, 17, 24]))
    dim = int(rng.choice([8, 16, 48]))
    edge_dim = int(rng.choice([0, 3]))
    opts = dict(
        m_dim=int(rng.choice([8, 16])),
        fourier_features=int(rng.choice([0, 2, 4])),
        num_nearest_neighbors=int(rng.choice([0, 4, 6])),
        norm_feats=bool(rng.rand() < 0.5),
        norm_coors=bool(rng.rand() < 0.5),
        update_feats=True,
        update_coors=bool(rng.rand() < 0.8),
        m_pool_method=str(rng.choice(["sum", "mean"])),
        soft_edges=bool(rng.rand() < 0.5),
        coor_weights_clamp_value=float(rng.choice([0.0, 2.0])) or None,
        valid_radius=float(rng.choice([np.inf, 5.0])),
    )
    torch.manual_seed(seed)
    tlayer = TorchEGNN(dim=dim, edge_dim=edge_dim, **opts)
    jlayer = EGNN(dim=dim, edge_dim=edge_dim, **opts)

    feats = jnp.asarray(rng.randn(2, n, dim))
    coors = jnp.asarray(rng.randn(2, n, 3))
    edges = jnp.asarray(rng.randn(2, n, n, edge_dim)) if edge_dim else None
    mask = jnp.asarray(rng.rand(2, n) > 0.2)
    _compare_layer(tlayer, jlayer, feats, coors, edges=edges, mask=mask,
                   atol=1e-8)


def test_parity_adjacency_degree_quirk_large_weights():
    """The reference's degree relabeling is XOR-like ((nxt - adj).bool(): the
    -1 difference also casts to True), so chain first-degree edges get
    relabeled to degree 2. With init_eps=0.5 any divergence here produces
    O(10) output differences — this pins the quirk at full strength (the
    default init_eps=1e-3 would crush it below tolerance)."""
    torch.manual_seed(11)
    n = 16
    kw = dict(depth=1, dim=8, num_tokens=5, num_adj_degrees=2, adj_dim=4)
    tnet = TorchEGNNNetwork(**kw, init_eps=0.5)
    jnet = EGNNNetwork(
        **{k: v for k, v in kw.items()},
        layer_kwargs=dict(init_eps=0.5),
    )
    key = jax.random.PRNGKey(11)
    feats = jax.random.randint(key, (1, n), 0, 5)
    coors = jax.random.normal(jax.random.PRNGKey(12), (1, n, 3))
    ar = jnp.arange(n)
    adj = jnp.abs(ar[:, None] - ar[None, :]) == 1  # chain: triangle-free

    with torch.no_grad():
        tf, tc = tnet(
            torch.tensor(np.asarray(feats)),
            torch.tensor(np.asarray(coors)),
            adj_mat=torch.tensor(np.asarray(adj)),
        )
    params = {"params": inject_network_params(tnet, 1)}
    jf, jc = jnet.apply(params, feats, coors, adj_mat=adj)
    np.testing.assert_allclose(jf, tf.numpy(), atol=1e-8, rtol=1e-6)
    np.testing.assert_allclose(jc, tc.numpy(), atol=1e-8, rtol=1e-6)


# ---------------------------------------------------------------------------
# Sparse/COO path vs the PyG reference (requires torch_geometric)
# ---------------------------------------------------------------------------

try:
    from egnn_pytorch.egnn_pytorch_geometric import EGNN_Sparse as TorchEGNNSparse

    TorchEGNNSparse(feats_dim=4)  # constructible only with PyG or the shim
    HAVE_PYG = True
except Exception:  # pragma: no cover
    HAVE_PYG = False

sparse_only = pytest.mark.skipif(not HAVE_PYG, reason="torch_geometric not available")


def _sparse_case(seed, n=24, d=6, e_attr=0, num_edges=64):
    rng = np.random.RandomState(seed)
    coors = rng.randn(n, 3)
    feats = rng.randn(n, d)
    x = np.concatenate([coors, feats], axis=-1)
    ei = rng.randint(0, n, size=(2, num_edges))
    ea = rng.randn(num_edges, e_attr) if e_attr else None
    return x, ei, ea


def _compare_sparse(tkw, jkw, seed=0, e_attr=0, atol=1e-10):
    from egnn_tpu import EGNNSparse
    from egnn_tpu.utils.port_weights import egnn_sparse_params_from_torch

    torch.manual_seed(seed)
    x, ei, ea = _sparse_case(seed, e_attr=e_attr)
    tlayer = TorchEGNNSparse(feats_dim=6, edge_attr_dim=e_attr, **tkw)
    with torch.no_grad():
        tout = tlayer(
            torch.tensor(x), torch.tensor(ei, dtype=torch.long),
            edge_attr=None if ea is None else torch.tensor(ea),
        )
    jlayer = EGNNSparse(feats_dim=6, edge_attr_dim=e_attr, **jkw)
    params = {"params": egnn_sparse_params_from_torch(tlayer)}
    jout = jlayer.apply(
        params, jnp.asarray(x), jnp.asarray(ei),
        edge_attr=None if ea is None else jnp.asarray(ea),
    )
    np.testing.assert_allclose(np.asarray(jout), tout.numpy(), atol=atol,
                               rtol=1e-8)


@sparse_only
def test_parity_sparse_basic():
    _compare_sparse({}, {})


@sparse_only
def test_parity_sparse_fourier_edgeattr():
    _compare_sparse(dict(fourier_features=4), dict(fourier_features=4),
                    seed=1, e_attr=3)


@sparse_only
@pytest.mark.parametrize("aggr", ["add", "mean", "max"])
def test_parity_sparse_aggr(aggr):
    _compare_sparse(dict(aggr=aggr), dict(aggr=aggr), seed=2)


@sparse_only
def test_parity_sparse_norms_softedge():
    _compare_sparse(
        dict(norm_feats=True, norm_coors=True, soft_edge=1),
        dict(norm_feats=True, norm_coors=True, soft_edge=1),
        seed=3,
    )


@sparse_only
def test_parity_sparse_update_flags():
    _compare_sparse(dict(update_feats=False), dict(update_feats=False), seed=4)
    _compare_sparse(dict(update_coors=False), dict(update_coors=False), seed=5)


@sparse_only
def test_parity_sparse_network_embeddings():
    """EGNN_Sparse_Network with node + edge categorical embeddings (the
    list-driven multi-embedding machinery, egnn_pytorch_geometric.py:334-346,
    402-411) — activation parity with injected weights. Global attention is
    excluded (broken in the reference, §2 #16) and recalc unset."""
    from egnn_pytorch.egnn_pytorch_geometric import (
        EGNN_Sparse_Network as TorchSparseNet)

    from egnn_tpu import EGNNSparseNetwork
    from egnn_tpu.utils.port_weights import (
        egnn_sparse_network_params_from_torch)

    torch.manual_seed(7)
    rng = np.random.RandomState(7)
    n, base_feats, e_cont = 20, 3, 2
    kw = dict(n_layers=2, feats_dim=base_feats + 1, pos_dim=3,
              edge_attr_dim=e_cont + 1, m_dim=16, fourier_features=2,
              norm_feats=True, norm_coors=True,
              embedding_nums=[6], embedding_dims=[5],
              edge_embedding_nums=[4], edge_embedding_dims=[3])
    tnet = TorchSparseNet(**kw)

    coors = rng.randn(n, 3)
    feats_cont = rng.randn(n, base_feats)
    feats_tok = rng.randint(0, 6, size=(n, 1)).astype(np.float64)
    x = np.concatenate([coors, feats_cont, feats_tok], axis=-1)
    num_edges = 50
    ei = rng.randint(0, n, size=(2, num_edges))
    ea_cont = rng.randn(num_edges, e_cont)
    ea_tok = rng.randint(0, 4, size=(num_edges, 1)).astype(np.float64)
    ea = np.concatenate([ea_cont, ea_tok], axis=-1)
    batch = np.zeros(n, dtype=np.int64)

    with torch.no_grad():
        tout = tnet(torch.tensor(x), torch.tensor(ei, dtype=torch.long),
                    torch.tensor(batch), torch.tensor(ea))

    jnet = EGNNSparseNetwork(**kw)
    params = {"params": egnn_sparse_network_params_from_torch(tnet)}
    jout = jnet.apply(params, jnp.asarray(x), jnp.asarray(ei),
                      batch=jnp.asarray(batch, dtype=jnp.int32),
                      edge_attr=jnp.asarray(ea))
    np.testing.assert_allclose(np.asarray(jout), tout.numpy(), atol=1e-10,
                               rtol=1e-8)


@sparse_only
@pytest.mark.parametrize("seed", range(6))
def test_parity_sparse_fuzzed_option_combinations(seed):
    """Randomized sweeps over the EGNN_Sparse option surface vs the torch
    reference (through the PyG stand-in) — any legal kwarg combination."""
    rng = np.random.RandomState(2000 + seed)
    e_attr = int(rng.choice([0, 2]))
    opts = dict(
        m_dim=int(rng.choice([8, 16])),
        fourier_features=int(rng.choice([0, 2, 4])),
        norm_feats=bool(rng.rand() < 0.5),
        norm_coors=bool(rng.rand() < 0.5),
        update_feats=True,
        update_coors=bool(rng.rand() < 0.8),
        soft_edge=int(rng.rand() < 0.5),
        aggr=str(rng.choice(["add", "mean", "max"])),
    )
    _compare_sparse(opts, dict(opts), seed=seed, e_attr=e_attr)
