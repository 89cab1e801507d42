"""Native host-side graph runtime (C++ via ctypes, compiled on demand).

The reference's sparse path leans on external C++/CUDA packages for graph
construction and edge layout (torch-cluster / torch-scatter / torch-sparse,
installed at examples/egnn_test.ipynb cell 4). Here the *device* side of that
work is Pallas/XLA (egnn_tpu/ops/pallas); this package is the *host* side:
real datasets arrive as numpy arrays, and building kNN/radius graphs,
destination-sorting edges for the TPU segment kernels, and packing
variable-size graph batches is host CPU work that should run in native code
(threaded, zero Python-loop overhead) overlapped with device steps.

No pybind11 in this environment, so the binding is a pure C ABI + ctypes.
The shared object is compiled on first use with g++ (``-O3 -fopenmp``,
falling back to single-threaded without OpenMP) and cached next to the
source keyed by a source hash. If no compiler is available,
``is_available()`` is False and the numpy fallbacks in this module keep the
API working (slower, same results).

Semantics are bit-compatible with the jnp builders in ``egnn_tpu/ops/graph``
(tested in tests/test_native.py): squared-distance ranking, lower-index
tie-breaks (same as ``jax.lax.top_k``), BIG=1e10 invalid fill, padding rows
pointing at node 0 (or the owning graph's base node in the batched layout).

Measured vs the numpy fallback on one host core (OpenMP multiplies this on
real multi-core hosts): batched kNN 4.0x at (32 graphs, 32 atoms, k=8),
5.2x at (8, 256, k=16), 48x at a single 4096-node graph k=16.
"""
from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import sys
import threading
from pathlib import Path
from typing import Optional

import numpy as np

_SRC = Path(__file__).with_name("graph_builder.cc")
_BUILD_DIR = Path(__file__).with_name("_build")

_lib = None
_lib_lock = threading.Lock()
_build_error: Optional[str] = None


def _compile() -> Optional[ctypes.CDLL]:
    src = _SRC.read_text()
    tag = hashlib.sha256(src.encode()).hexdigest()[:16]
    so_path = _BUILD_DIR / f"graph_builder_{tag}.so"
    if not so_path.exists():
        _BUILD_DIR.mkdir(exist_ok=True)
        # compile to a process-unique temp path, then rename: atomic on
        # POSIX, so concurrent processes (e.g. DataLoader-style workers)
        # never dlopen a half-written .so
        tmp_path = so_path.with_suffix(f".tmp{os.getpid()}")
        base = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC",
                str(_SRC), "-o", str(tmp_path)]
        for extra in (["-fopenmp"], []):
            try:
                subprocess.run(base + extra, check=True, capture_output=True,
                               timeout=120)
                os.replace(tmp_path, so_path)
                break
            except (subprocess.CalledProcessError, FileNotFoundError,
                    subprocess.TimeoutExpired) as e:
                err = getattr(e, "stderr", b"") or str(e).encode()
                last_err = err.decode(errors="replace") if isinstance(err, bytes) else str(err)
        else:
            global _build_error
            _build_error = last_err
            return None
    lib = ctypes.CDLL(str(so_path))
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    c = ctypes
    lib.egnn_knn_graph.restype = c.c_int
    lib.egnn_knn_graph.argtypes = [f64p, c.c_int64, c.c_int, c.c_int,
                                   c.c_void_p, c.c_int, i32p, i32p, u8p]
    lib.egnn_batched_knn_graph.restype = c.c_int
    lib.egnn_batched_knn_graph.argtypes = [f64p, c.c_int64, c.c_int, c.c_int,
                                           c.c_int, c.c_void_p, c.c_int,
                                           i32p, i32p, u8p]
    lib.egnn_radius_graph.restype = c.c_int64
    lib.egnn_radius_graph.argtypes = [f64p, c.c_int64, c.c_int, c.c_double,
                                      c.c_int64, c.c_void_p, c.c_int,
                                      i32p, i32p, u8p]
    lib.egnn_sort_edges_by_receiver.restype = c.c_int
    lib.egnn_sort_edges_by_receiver.argtypes = [i32p, c.c_void_p, c.c_int64,
                                                c.c_int64, i32p]
    lib.egnn_pack_batch.restype = c.c_int
    lib.egnn_pack_batch.argtypes = [i32p, c.c_int64, c.c_int, i32p, u8p]
    lib.egnn_native_num_threads.restype = c.c_int
    lib.egnn_native_num_threads.argtypes = []
    return lib


def _get_lib() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is None and _build_error is None:
        with _lib_lock:
            if _lib is None and _build_error is None:
                _lib = _compile()
    return _lib


def is_available() -> bool:
    """True when the C++ runtime compiled and loaded."""
    return _get_lib() is not None


def build_error() -> Optional[str]:
    """Compiler stderr if the native build failed, else None."""
    _get_lib()
    return _build_error


def num_threads() -> int:
    lib = _get_lib()
    return lib.egnn_native_num_threads() if lib is not None else 1


def _mask_ptr(node_mask: Optional[np.ndarray]):
    if node_mask is None:
        return None
    m = np.ascontiguousarray(node_mask, dtype=np.uint8)
    return m, m.ctypes.data_as(ctypes.c_void_p)


# ---------------------------------------------------------------------------
# numpy-level API (native when available, numpy fallback otherwise)
# ---------------------------------------------------------------------------

_BIG = 1e10


def knn_graph_np(coors: np.ndarray, k: int,
                 node_mask: Optional[np.ndarray] = None,
                 loop: bool = False):
    """kNN edge list from (n, c) host coordinates.

    Returns ``(senders, receivers, mask)`` with shapes (n*k,), receiver-major,
    identical to ``egnn_tpu.ops.graph.knn_graph`` on the same inputs.
    """
    coors = np.ascontiguousarray(coors, dtype=np.float64)
    n, c = coors.shape
    lib = _get_lib()
    if lib is not None:
        senders = np.empty(n * k, dtype=np.int32)
        receivers = np.empty(n * k, dtype=np.int32)
        mask = np.empty(n * k, dtype=np.uint8)
        held = _mask_ptr(node_mask)
        rc = lib.egnn_knn_graph(coors, n, c, k,
                                None if held is None else held[1],
                                int(loop), senders, receivers, mask)
        if rc == 0:
            return senders, receivers, mask.astype(bool)
    return _knn_graph_numpy(coors, k, node_mask, loop)


def _knn_graph_numpy(coors, k, node_mask, loop):
    n = coors.shape[0]
    rel = coors[:, None, :] - coors[None, :, :]
    dist = np.sum(rel * rel, axis=-1)
    if not loop:
        np.fill_diagonal(dist, _BIG)
    if node_mask is not None:
        m = np.asarray(node_mask, dtype=bool)
        dist = np.where(m[:, None] & m[None, :], dist, _BIG)
    kk = min(k, n)
    idx = np.argsort(dist, axis=1, kind="stable")[:, :kk]  # ties -> lower j
    vals = np.take_along_axis(dist, idx, axis=1)
    valid = vals < _BIG
    if kk < k:  # capacity beyond n: pad slots are INVALID (match the C++ path)
        idx = np.pad(idx, ((0, 0), (0, k - kk)))
        valid = np.pad(valid, ((0, 0), (0, k - kk)))
    senders = np.where(valid, idx, 0).astype(np.int32).reshape(-1)
    receivers = np.where(valid, np.arange(n)[:, None], 0).astype(np.int32).reshape(-1)
    return senders, receivers, valid.reshape(-1)


def batched_knn_graph_np(coors: np.ndarray, k: int,
                         node_mask: Optional[np.ndarray] = None,
                         loop: bool = False):
    """Per-graph kNN over a packed (g, na, c) batch with global node offsets
    applied — one call builds a whole molecule batch's edge set
    (the layout of examples/molecule_regression.py:76-81). Padding rows point
    at the owning graph's base node. Returns (senders, receivers, mask) of
    shape (g*na*k,)."""
    coors = np.ascontiguousarray(coors, dtype=np.float64)
    g, na, c = coors.shape
    lib = _get_lib()
    if lib is not None:
        senders = np.empty(g * na * k, dtype=np.int32)
        receivers = np.empty(g * na * k, dtype=np.int32)
        mask = np.empty(g * na * k, dtype=np.uint8)
        held = _mask_ptr(node_mask)
        rc = lib.egnn_batched_knn_graph(coors.reshape(g * na, c), g, na, c, k,
                                        None if held is None else held[1],
                                        int(loop), senders, receivers, mask)
        if rc == 0:
            return senders, receivers, mask.astype(bool)
    # fallback: loop the single-graph numpy path with offsets
    ss, rr, mm = [], [], []
    for gi in range(g):
        nm = None if node_mask is None else np.asarray(node_mask).reshape(g, na)[gi]
        s, r, m = _knn_graph_numpy(coors[gi], k, nm, loop)
        base = gi * na
        ss.append(np.where(m, s + base, base))
        rr.append(np.where(m, r + base, base))
        mm.append(m)
    return (np.concatenate(ss).astype(np.int32),
            np.concatenate(rr).astype(np.int32), np.concatenate(mm))


def radius_graph_np(coors: np.ndarray, radius: float, max_edges: int,
                    node_mask: Optional[np.ndarray] = None,
                    loop: bool = False):
    """Static-capacity radius graph; over capacity keeps the globally closest
    pairs; output receiver-major. Matches ``ops.graph.radius_graph``."""
    coors = np.ascontiguousarray(coors, dtype=np.float64)
    n, c = coors.shape
    lib = _get_lib()
    if lib is not None:
        senders = np.empty(max_edges, dtype=np.int32)
        receivers = np.empty(max_edges, dtype=np.int32)
        mask = np.empty(max_edges, dtype=np.uint8)
        held = _mask_ptr(node_mask)
        ne = lib.egnn_radius_graph(coors, n, c, float(radius), max_edges,
                                   None if held is None else held[1],
                                   int(loop), senders, receivers, mask)
        if ne >= 0:
            return senders, receivers, mask.astype(bool)
    rel = coors[:, None, :] - coors[None, :, :]
    dist = np.sum(rel * rel, axis=-1)
    ok = dist <= radius**2
    if not loop:
        np.fill_diagonal(ok, False)
    if node_mask is not None:
        m = np.asarray(node_mask, dtype=bool)
        ok &= m[:, None] & m[None, :]
    flat = np.where(ok, dist, _BIG).reshape(-1)
    order = np.lexsort((np.arange(n * n), flat))[:max_edges]
    mask = flat[order] < _BIG
    order = np.sort(np.where(mask, order, n * n))
    mask = order < n * n
    order = np.where(mask, order, 0)
    receivers = np.where(mask, order // n, 0).astype(np.int32)
    senders = np.where(mask, order % n, 0).astype(np.int32)
    return senders, receivers, mask


def sort_edges_by_receiver_np(receivers: np.ndarray,
                              mask: Optional[np.ndarray],
                              num_nodes: int) -> np.ndarray:
    """Stable permutation putting edges in receiver-major order, padding
    last — the destination-sorted layout the TPU segment path wants
    (ops/pallas/segment.py). Apply the permutation to every edge array."""
    receivers = np.ascontiguousarray(receivers, dtype=np.int32)
    e = receivers.shape[0]
    lib = _get_lib()
    if lib is not None:
        perm = np.empty(e, dtype=np.int32)
        held = _mask_ptr(mask)
        rc = lib.egnn_sort_edges_by_receiver(receivers,
                                             None if held is None else held[1],
                                             e, num_nodes, perm)
        if rc == 0:
            return perm
    key = receivers.astype(np.int64)
    if mask is not None:
        key = np.where(np.asarray(mask, dtype=bool), key, num_nodes)
    return np.argsort(key, kind="stable").astype(np.int32)


def pack_batch_np(sizes: np.ndarray, node_capacity: int):
    """Per-graph node counts -> (batch_ids, node_mask), both (g*na,). The
    static-capacity form of the PyG batch vector
    (egnn_pytorch_geometric.py:189)."""
    sizes = np.ascontiguousarray(sizes, dtype=np.int32)
    g = sizes.shape[0]
    lib = _get_lib()
    if lib is not None:
        batch_ids = np.empty(g * node_capacity, dtype=np.int32)
        node_mask = np.empty(g * node_capacity, dtype=np.uint8)
        rc = lib.egnn_pack_batch(sizes, g, node_capacity, batch_ids, node_mask)
        if rc == 0:
            return batch_ids, node_mask.astype(bool)
        raise ValueError(f"graph size exceeds node capacity {node_capacity}: "
                         f"{sizes.max()}")
    if sizes.max(initial=0) > node_capacity or sizes.min(initial=0) < 0:
        raise ValueError(f"graph size exceeds node capacity {node_capacity}: "
                         f"{sizes.max()}")
    batch_ids = np.repeat(np.arange(g, dtype=np.int32), node_capacity)
    node_mask = (np.tile(np.arange(node_capacity), g)
                 < np.repeat(sizes, node_capacity))
    return batch_ids, node_mask


__all__ = [
    "is_available",
    "build_error",
    "num_threads",
    "knn_graph_np",
    "batched_knn_graph_np",
    "radius_graph_np",
    "sort_edges_by_receiver_np",
    "pack_batch_np",
]
