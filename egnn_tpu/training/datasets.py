"""Real-data adapters for the protein-backbone denoising workload.

The reference's actual dataset is sidechainnet CASP12 loaded through its own
package (denoise_sparse.py:34-40); the data file itself is external to both
frameworks. This module provides the framework side of that pipeline:

- a simple on-disk BACKBONE format (npz, optionally HDF5 when h5py exists):
  per-protein residue tokens, (L, 3, 3) backbone-atom coordinates
  [N, CA, C], and a residue validity mask;
- ``BackboneDataset``: loader + the reference's exact batch transform
  (denoise_sparse.py:55-68): keep 3 backbone atoms per residue, repeat
  tokens/mask x3 to per-atom, chain adjacency i~i+-1, additive Gaussian
  noise — producing the same ``DenoiseBatch`` the training step consumes;
- ``make_synthetic_backbone_dataset``: a generator writing a realistic-ish
  backbone file (CA random walk at ~3.8 A spacing with N/C offsets), so the
  full file->PrefetchLoader->train pipeline runs end-to-end in environments
  without sidechainnet (zero-egress CI, this repo's examples).

Host-side numpy by design: dataset decode + batch assembly run on CPU
threads (PrefetchLoader) overlapped with device steps.
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np

from .data import DenoiseBatch


def save_backbone_npz(path: str, tokens: np.ndarray, coords: np.ndarray,
                      masks: np.ndarray) -> None:
    """Write the backbone format: tokens (P, L) int, coords (P, L, 3, 3) f32
    ([N, CA, C] per residue), masks (P, L) bool."""
    tokens = np.asarray(tokens, np.int32)
    coords = np.asarray(coords, np.float32)
    masks = np.asarray(masks, bool)
    P, L = tokens.shape
    assert coords.shape == (P, L, 3, 3) and masks.shape == (P, L)
    np.savez_compressed(path, tokens=tokens, coords=coords, masks=masks)


class BackboneDataset:
    """Backbone denoising dataset over the npz/HDF5 format above."""

    def __init__(self, tokens: np.ndarray, coords: np.ndarray,
                 masks: np.ndarray):
        self.tokens = np.asarray(tokens, np.int32)
        self.coords = np.asarray(coords, np.float32)
        self.masks = np.asarray(masks, bool)
        self.num_proteins, self.seq_len = self.tokens.shape

    @classmethod
    def load(cls, path: str) -> "BackboneDataset":
        if path.endswith((".h5", ".hdf5")):
            try:
                import h5py  # optional; not part of the baked environment
            except ImportError as e:
                raise ImportError(
                    "HDF5 backbone files need h5py; use the npz format "
                    "(save_backbone_npz) in this environment"
                ) from e
            with h5py.File(path, "r") as f:
                return cls(f["tokens"][()], f["coords"][()], f["masks"][()])
        with np.load(path) as z:
            return cls(z["tokens"], z["coords"], z["masks"])

    def denoise_batch(
        self,
        rng: np.random.RandomState,
        batch: int,
        num_residues: Optional[int] = None,
        noise_std: float = 1.0,
    ) -> DenoiseBatch:
        """Sample proteins and apply the reference's batch transform
        (denoise_sparse.py:48-68): crop/pad to ``num_residues``, expand to
        per-atom tokens/mask (x3), flatten coords to (b, 3L, 3), chain
        adjacency, additive Gaussian noise on the coordinates.

        Returns numpy arrays (a ``DenoiseBatch``); push through
        jax.device_put / PrefetchLoader for training.
        """
        from ..ops.graph import chain_adjacency
        import jax.numpy as jnp

        L = num_residues or self.seq_len
        idx = rng.randint(0, self.num_proteins, size=batch)
        tok = np.zeros((batch, L), np.int32)
        crd = np.zeros((batch, L, 3, 3), np.float32)
        msk = np.zeros((batch, L), bool)
        for bi, pi in enumerate(idx):
            Lp = min(L, self.seq_len)
            start = 0
            if self.seq_len > L:
                start = rng.randint(0, self.seq_len - L + 1)
            tok[bi, :Lp] = self.tokens[pi, start:start + Lp]
            crd[bi, :Lp] = self.coords[pi, start:start + Lp]
            msk[bi, :Lp] = self.masks[pi, start:start + Lp]

        n = 3 * L
        tokens_a = np.repeat(tok, 3, axis=1)                  # (b, 3L)
        mask_a = np.repeat(msk, 3, axis=1)                    # (b, 3L)
        clean = crd.reshape(batch, n, 3)
        # center valid atoms (translation-invariant task; keeps coordinates
        # in a scale-friendly range)
        denom = np.maximum(mask_a.sum(axis=1, keepdims=True), 1)[..., None]
        center = (clean * mask_a[..., None]).sum(axis=1, keepdims=True) / denom
        clean = np.where(mask_a[..., None], clean - center, 0.0)
        noised = clean + noise_std * rng.randn(batch, n, 3).astype(np.float32)
        return DenoiseBatch(
            tokens=tokens_a,
            clean_coors=clean.astype(np.float32),
            noised_coors=noised.astype(np.float32),
            mask=mask_a,
            adj_mat=np.asarray(chain_adjacency(n)),
        )


def make_synthetic_backbone_dataset(
    path: str,
    num_proteins: int = 64,
    seq_len: int = 128,
    num_tokens: int = 21,
    seed: int = 0,
) -> str:
    """Generate and save a synthetic-but-backbone-shaped dataset file:
    CA trace as a smoothed random walk with ~3.8 A steps; N and C placed at
    ~1.46/1.52 A offsets along the local chain direction; 10% of tail
    residues masked out per protein (variable lengths)."""
    rng = np.random.RandomState(seed)
    P, L = num_proteins, seq_len
    tokens = rng.randint(0, num_tokens, size=(P, L)).astype(np.int32)

    steps = rng.randn(P, L, 3).astype(np.float32)
    # smooth the walk so it locally resembles secondary structure
    for _ in range(2):
        steps[:, 1:] = 0.6 * steps[:, 1:] + 0.4 * steps[:, :-1]
    steps /= np.linalg.norm(steps, axis=-1, keepdims=True) + 1e-8
    ca = np.cumsum(3.8 * steps, axis=1)
    ca -= ca.mean(axis=1, keepdims=True)
    d = np.diff(ca, axis=1, prepend=ca[:, :1] - 3.8 * steps[:, :1])
    d /= np.linalg.norm(d, axis=-1, keepdims=True) + 1e-8
    n_at = ca - 1.46 * d
    c_at = ca + 1.52 * d
    coords = np.stack([n_at, ca, c_at], axis=2).astype(np.float32)  # (P,L,3,3)

    lengths = rng.randint(int(0.9 * L), L + 1, size=P)
    masks = np.arange(L)[None, :] < lengths[:, None]
    save_backbone_npz(path, tokens, coords, masks)
    return path
