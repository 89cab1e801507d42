"""Synthetic data generators for the example workloads.

Mirrors the *shape* of the reference's protein-denoising pipeline
(denoise_sparse.py:48-68: token sequence, chain coordinates, boolean mask,
chain adjacency, Gaussian noise) without the sidechainnet dependency — the
dataset itself is external to both frameworks.
"""
from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

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


class MoleculeBatch(NamedTuple):
    """A packed variable-size molecule batch in the sparse-path layout
    (x = [coors | feats], COO edges, batch vector — matching the PyG
    convention the reference's sparse stack uses,
    egnn_pytorch_geometric.py:182-191)."""

    x: np.ndarray           # (G*NA, 3+1) coords + raw type column
    edge_index: np.ndarray  # (2, G*NA*K) int32, [senders; receivers]
    edge_mask: np.ndarray   # (G*NA*K,) bool
    batch_ids: np.ndarray   # (G*NA,) int32 graph ids
    node_mask: np.ndarray   # (G*NA,) bool
    target: np.ndarray      # (G,) regression target


def synthetic_molecule_batch_np(
    rng: np.random.RandomState,
    num_graphs: int,
    node_capacity: int,
    k: int,
    num_types: int = 5,
    charges=(-0.8, -0.3, 0.1, 0.5, 1.0),
) -> MoleculeBatch:
    """Host-side molecule-batch builder (numpy + the native C++ graph
    runtime): random molecules with a Coulomb-like invariant energy target,
    kNN edges built by ``native.batched_knn_graph_np`` and packed by
    ``native.pack_batch_np``. This is the real-dataset input-pipeline path —
    graph construction runs on host CPU threads, overlapped with device
    steps via ``PrefetchLoader`` — mirroring how the reference's sparse
    examples feed PyG graphs built by torch-cluster (examples/
    egnn_test.ipynb cell 4)."""
    from .. import native as nat

    G, NA = num_graphs, node_capacity
    charges = np.asarray(charges)
    types = rng.randint(0, num_types, size=(G, NA))
    min_atoms = min(8, NA)
    sizes = rng.randint(min_atoms, NA + 1, size=G).astype(np.int32)
    batch_ids, node_mask = nat.pack_batch_np(sizes, NA)
    coors = 2.0 * rng.randn(G, NA, 3)

    q = charges[types]
    nm2 = node_mask.reshape(G, NA)
    pm = nm2[:, :, None] & nm2[:, None, :]
    pm &= ~np.eye(NA, dtype=bool)[None]
    rel = coors[:, :, None, :] - coors[:, None, :, :]
    r = np.sqrt(np.clip(np.sum(rel**2, -1), 1e-2, None))
    e_pair = q[:, :, None] * q[:, None, :] / r
    target = 0.5 * np.where(pm, e_pair, 0.0).sum(axis=(1, 2))

    senders, receivers, edge_mask = nat.batched_knn_graph_np(
        coors, k, node_mask=nm2)
    x = np.concatenate(
        [coors.reshape(G * NA, 3), types.reshape(G * NA, 1).astype(np.float64)],
        axis=-1,
    )
    return MoleculeBatch(
        x=x,
        edge_index=np.stack([senders, receivers]),
        edge_mask=edge_mask,
        batch_ids=batch_ids,
        node_mask=node_mask,
        target=target,
    )


class PrefetchLoader:
    """Background-thread host->device input pipeline.

    Pulls batches from a host-side builder (numpy; e.g.
    ``synthetic_molecule_batch_np`` with the native C++ graph runtime) on a
    worker thread and keeps ``depth`` device-resident batches ready, so graph
    construction overlaps device compute — the role the reference delegates
    to torch DataLoader workers + torch-cluster (SURVEY.md §2b).

    ``make_batch`` is called with no arguments per batch; iteration yields
    device arrays (committed via ``jax.device_put`` with an optional
    sharding). Call ``close()`` (or exhaust ``num_batches``) to stop the
    worker.
    """

    _STOP = object()

    def __init__(
        self,
        make_batch: Callable[[], object],
        depth: int = 2,
        num_batches: int | None = None,
        sharding=None,
    ):
        self._make = make_batch
        self._n = num_batches
        self._sharding = sharding
        self._q: queue.Queue = queue.Queue(maxsize=max(1, depth))
        self._stop = threading.Event()
        self._error: BaseException | None = None
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _worker(self):
        produced = 0
        try:
            while not self._stop.is_set():
                if self._n is not None and produced >= self._n:
                    self._q.put(self._STOP)
                    return
                batch = self._make()
                # device_put from the worker thread: the H2D copy (and any
                # donation bookkeeping) happens off the training thread.
                device_batch = jax.device_put(batch, self._sharding)
                while not self._stop.is_set():
                    try:
                        self._q.put(device_batch, timeout=0.1)
                        break
                    except queue.Full:
                        continue
                produced += 1
        except BaseException as e:  # surfaced in __next__, not swallowed
            self._error = e

    def __iter__(self) -> Iterator:
        return self

    def __next__(self):
        while True:
            try:
                item = self._q.get(timeout=0.1)
                break
            except queue.Empty:
                if not self._thread.is_alive():
                    if self._error is not None:
                        raise RuntimeError(
                            "PrefetchLoader worker failed"
                        ) from self._error
                    raise StopIteration
        if item is self._STOP:
            raise StopIteration
        return item

    def close(self):
        self._stop.set()
        try:  # drain so the worker's blocked put can observe the stop flag
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass
        self._thread.join(timeout=5)
