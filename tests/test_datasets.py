"""Backbone dataset adapter (training/datasets.py): file round-trip, the
reference batch transform (x3 atom expansion, chain adjacency, masking), and
PrefetchLoader delivery."""
import numpy as np
import jax.numpy as jnp

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
