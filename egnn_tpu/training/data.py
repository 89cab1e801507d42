"""Synthetic data generators for the example workloads.

Mirrors the *shape* of the reference's protein-denoising pipeline
(denoise_sparse.py:48-68: token sequence, chain coordinates, boolean mask,
chain adjacency, Gaussian noise) without the sidechainnet dependency — the
dataset itself is external to both frameworks.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.graph import chain_adjacency


class DenoiseBatch(NamedTuple):
    tokens: jnp.ndarray        # (b, n) int32
    clean_coors: jnp.ndarray   # (b, n, 3)
    noised_coors: jnp.ndarray  # (b, n, 3)
    mask: jnp.ndarray          # (b, n) bool
    adj_mat: jnp.ndarray       # (n, n) bool — chain i ~ i±1


def synthetic_chain_batch(
    key: jax.Array,
    batch: int,
    n: int,
    num_tokens: int = 21,
    noise_std: float = 1.0,
    step_std: float = 1.2,
    min_len_frac: float = 0.6,
) -> DenoiseBatch:
    """Random-walk 'backbone' chains with variable valid lengths.

    Coordinates are cumulative Gaussian steps (protein-backbone-like local
    structure); the model learns to undo additive Gaussian noise, the exact
    task of the reference example (denoise_sparse.py:68-74).
    """
    k_tok, k_len, k_step, k_noise = jax.random.split(key, 4)
    tokens = jax.random.randint(k_tok, (batch, n), 0, num_tokens)
    steps = step_std * jax.random.normal(k_step, (batch, n, 3))
    clean = jnp.cumsum(steps, axis=1)
    clean = clean - clean.mean(axis=1, keepdims=True)
    noised = clean + noise_std * jax.random.normal(k_noise, (batch, n, 3))
    min_len = int(n * min_len_frac)
    lengths = jax.random.randint(k_len, (batch, 1), min_len, n + 1)
    mask = jnp.arange(n)[None, :] < lengths
    return DenoiseBatch(
        tokens=tokens,
        clean_coors=clean,
        noised_coors=noised,
        mask=mask,
        adj_mat=chain_adjacency(n),
    )
