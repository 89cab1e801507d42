"""GVP-derived protein featurization helpers (ops/featurize.py) — the
reference notebook's encode_whole_protein pipeline (egnn_test.ipynb cells
16-22, 37-39): shapes, chemistry invariants, degree labels, and end-to-end
compatibility with EGNNSparseNetwork's embedding machinery."""
import jax
import jax.numpy as jnp
import numpy as np

from egnn_tpu.ops.featurize import (
    NUM_COORDS_PER_RES,
    aa_ids,
    atoms_per_residue,
    chain2atoms,
    encode_dist,
    encode_whole_protein,
    prot_covalent_bond,
    scn_cloud_mask,
)


def test_cloud_mask_counts():
    assert atoms_per_residue("G") == 4      # backbone only
    assert atoms_per_residue("A") == 5      # + CB
    assert atoms_per_residue("W") == 14     # fills all slots
    m = scn_cloud_mask("GAW")
    assert m.shape == (3, 14)
    assert m.sum() == 4 + 5 + 14
    # slots fill from the front
    assert m[0, :4].all() and not m[0, 4:].any()


def test_encode_dist_shape_and_values():
    x = jnp.asarray([0.0, 1.0, 2.0])
    e = encode_dist(x, scales=[1, 2])
    assert e.shape == (3, 5)  # 2*2 + raw
    np.testing.assert_allclose(np.asarray(e[1]),
                               [np.sin(1), np.sin(0.5), np.cos(1),
                                np.cos(0.5), 1.0], rtol=1e-6)
    e2 = encode_dist(x, scales=[1, 2, 4], include_self=False)
    assert e2.shape == (3, 6)


def test_chain2atoms():
    x = jnp.arange(3.0)
    out = chain2atoms(x)
    assert out.shape == (3, NUM_COORDS_PER_RES)
    assert bool((out[1] == 1.0).all())


def test_covalent_bonds_chemistry():
    seq = "GAP"
    idx, attr = prot_covalent_bond(seq, adj_degree=1)
    n = scn_cloud_mask(seq).sum()
    pairs = set(zip(idx[0].tolist(), idx[1].tolist()))
    # undirected
    assert all((b, a) in pairs for a, b in pairs)
    # all degree-1
    assert (attr == 1.0).all()
    # GLY occupies nodes 0..3 (N,CA,C,O): N-CA, CA-C, C-O
    assert (0, 1) in pairs and (1, 2) in pairs and (2, 3) in pairs
    # no O-N bond within a residue
    assert (3, 0) not in pairs
    # peptide bond: C of GLY (node 2) to N of ALA (node 4)
    assert (2, 4) in pairs
    # ALA: nodes 4..8 (N,CA,C,O,CB): CA-CB
    assert (5, 8) in pairs
    # PRO ring closure: CD bonds back to its own N
    # PRO nodes start at 9: N=9, CA=10, C=11, O=12, CB=13, CG=14, CD=15
    assert (15, 9) in pairs
    # in-bounds
    assert idx.max() < n


def test_covalent_bond_degree_labels():
    seq = "GG"
    idx, attr = prot_covalent_bond(seq, adj_degree=2)
    amap = {(a, b): v for a, b, v in zip(idx[0], idx[1], attr)}
    # direct bonds keep label 1
    assert amap[(0, 1)] == 1.0
    # two-hop N..C within GLY: N-CA-C
    assert amap[(0, 2)] == 2.0
    # self pairs appear at degree 2 (i->j->i), like the reference's matmul
    assert amap[(0, 0)] == 2.0


def test_encode_whole_protein_and_network():
    seq = "MAGICW"
    L = len(seq)
    rng = np.random.RandomState(0)
    coords = rng.randn(L * NUM_COORDS_PER_RES, 3).astype(np.float32)
    x, edge_index, edge_attr, info = encode_whole_protein(
        seq, coords, aa_pos_scales=[2, 4], adj_degree=1)
    n = info["num_atoms"]
    assert x.shape == (n, 3 + 5 + 2)
    # id columns are integral and within the embedding vocabularies
    assert np.allclose(x[:, -2], np.round(x[:, -2]))
    assert x[:, -2].max() < NUM_COORDS_PER_RES and x[:, -1].max() < 20
    assert (aa_ids(seq) >= 0).all()

    # feeds the sparse network with categorical embeddings (notebook cell 19)
    from egnn_tpu import EGNNSparseNetwork

    net = EGNNSparseNetwork(
        n_layers=2, feats_dim=2, pos_dim=3, edge_attr_dim=1, m_dim=8,
        fourier_features=2, embedding_nums=[14, 20], embedding_dims=[4, 4],
        norm_feats=True,
    )
    # nodes = [coords | two id columns]; the Fourier position block is left
    # out to exercise the pure-categorical path like cell 19's feats_dim=2
    x_in = jnp.asarray(np.concatenate([x[:, :3], x[:, -2:]], axis=-1))
    ei = jnp.asarray(edge_index)
    ea = jnp.asarray(edge_attr)[:, None]
    params = net.init(jax.random.PRNGKey(0), x_in, ei, edge_attr=ea)
    out = net.apply(params, x_in, ei, edge_attr=ea)
    assert out.shape[0] == n and bool(jnp.isfinite(out).all())

    # padding_seq drops tail residues
    x2, *_ = encode_whole_protein(seq + "GG", coords, padding_seq=2,
                                  aa_pos_scales=[2, 4])
    assert x2.shape[0] == n
