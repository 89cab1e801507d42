"""Backbone dataset adapter (training/datasets.py): file round-trip, the
reference batch transform (x3 atom expansion, chain adjacency, masking), and
PrefetchLoader delivery."""
import numpy as np
import jax.numpy as jnp
import pytest

from egnn_tpu.training.data import PrefetchLoader
from egnn_tpu.training.datasets import (
    BackboneDataset,
    make_synthetic_backbone_dataset,
    save_backbone_npz,
)


def test_roundtrip_and_batch_transform(tmp_path):
    path = str(tmp_path / "bb.npz")
    make_synthetic_backbone_dataset(path, num_proteins=8, seq_len=40, seed=3)
    ds = BackboneDataset.load(path)
    assert ds.tokens.shape == (8, 40) and ds.coords.shape == (8, 40, 3, 3)

    rng = np.random.RandomState(0)
    b = ds.denoise_batch(rng, batch=2, noise_std=0.5)
    n = 3 * 40
    assert b.tokens.shape == (2, n) and b.clean_coors.shape == (2, n, 3)
    assert b.mask.shape == (2, n) and b.adj_mat.shape == (n, n)
    # per-residue expansion: the 3 atoms of a residue share token and mask
    t = b.tokens.reshape(2, 40, 3)
    assert (t == t[:, :, :1]).all()
    # noise actually applied on valid atoms
    diff = np.abs(b.noised_coors - b.clean_coors)[b.mask]
    assert diff.mean() > 0.1
    # masked atoms zeroed in clean coords
    if (~b.mask).any():
        assert np.abs(b.clean_coors[~b.mask]).max() == 0.0
    # CA spacing ~3.8 within valid region
    ca = b.clean_coors.reshape(2, 40, 3, 3)[0, :, 1]
    steps = np.linalg.norm(np.diff(ca, axis=0), axis=-1)
    valid_steps = b.mask.reshape(2, 40, 3)[0, 1:, 0]
    assert np.allclose(steps[valid_steps], 3.8, atol=0.2)


def test_crop_and_pad(tmp_path):
    path = str(tmp_path / "bb2.npz")
    make_synthetic_backbone_dataset(path, num_proteins=4, seq_len=30, seed=1)
    ds = BackboneDataset.load(path)
    rng = np.random.RandomState(1)
    b_crop = ds.denoise_batch(rng, 1, num_residues=16)
    assert b_crop.tokens.shape == (1, 48)
    b_pad = ds.denoise_batch(rng, 1, num_residues=40)
    assert b_pad.tokens.shape == (1, 120)
    assert not b_pad.mask[0, 3 * 30:].any()  # padded residues invalid


def test_prefetch_delivery(tmp_path):
    path = str(tmp_path / "bb3.npz")
    make_synthetic_backbone_dataset(path, num_proteins=4, seq_len=20, seed=2)
    ds = BackboneDataset.load(path)
    rng = np.random.RandomState(2)
    loader = PrefetchLoader(lambda: ds.denoise_batch(rng, 2), depth=2,
                            num_batches=3)
    batches = list(loader)
    assert len(batches) == 3
    assert isinstance(batches[0].clean_coors, jnp.ndarray)
    loader.close()


def test_qm9_padded_and_flat_layouts(tmp_path):
    from egnn_tpu.training.datasets import QM9Dataset, make_synthetic_qm9_file

    p = str(tmp_path / "qm9.npz")
    make_synthetic_qm9_file(p, num_molecules=16, max_atoms=18, seed=3)
    ds = QM9Dataset.load(p)
    assert ds.num_molecules == 16 and ds.max_atoms == 18
    assert ds.tokens.max() <= 5 and ds.tokens.min() >= 0

    # flat layout round-trips to the same arrays
    N = ds.n_atoms
    zmap = np.asarray(QM9Dataset.ATOMIC_NUMBERS + (0,))
    flatR = np.concatenate([ds.positions[i, : N[i]] for i in range(16)])
    flatZ = np.concatenate([zmap[ds.tokens[i, : N[i]]] for i in range(16)])
    p2 = str(tmp_path / "qm9_flat.npz")
    np.savez(p2, R=flatR, Z=flatZ, N=N, U0=ds.targets)
    ds2 = QM9Dataset.load(p2)
    A2 = ds2.max_atoms
    np.testing.assert_allclose(ds2.positions, ds.positions[:, :A2])
    np.testing.assert_array_equal(ds2.tokens, ds.tokens[:, :A2])
    np.testing.assert_allclose(ds2.targets, ds.targets)

    rng = np.random.RandomState(0)
    coors, tok, mask, y = ds.batch(rng, 4, node_capacity=20)
    assert coors.shape == (4, 20, 3) and tok.shape == (4, 20)
    assert mask.shape == (4, 20) and y.shape == (4,)
    assert (tok[~mask] == 5).all()          # padding token
    assert (mask.sum(1) > 0).all()

    yn, mu, sd = ds.normalized_targets()
    assert abs(float(yn.mean())) < 1e-5 and abs(float(yn.std()) - 1) < 1e-5


def test_sidechainnet_export_gated(tmp_path):
    from egnn_tpu.training.datasets import export_sidechainnet

    try:
        import sidechainnet  # noqa: F401
        pytest.skip("sidechainnet present; export exercised by example")
    except ImportError:
        pass
    with pytest.raises(ImportError, match="sidechainnet"):
        export_sidechainnet(str(tmp_path / "scn.npz"))
