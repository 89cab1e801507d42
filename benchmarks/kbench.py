"""Kernel micro-benchmark harness with roofline accounting (SURVEY.md §5.1/§6).

Times each hot op on the attached TPU and reports achieved FLOP/s / bandwidth
against v5e peaks. Run on TPU:  python benchmarks/kbench.py [--quick]

Ops covered:
- pallas kNN-select vs the XLA distance-matrix+top_k path
- segment-sum on destination-sorted vs shuffled edge layout
- streamed all-pairs EGNN layer fwd and fwd+bwd (pairs/s)
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from egnn_tpu.ops import neighbors as nb
from egnn_tpu.ops.pallas.knn import knn_select_pallas, knn_select_pallas_tiled
from egnn_tpu.utils.profiling import Roofline, chain_calls, measure_op, time_fn


def bench_knn(n=1024, k=8, c=3, reps=(200, 1000), include_xla=True):
    rng = np.random.RandomState(0)
    coors = jnp.asarray(rng.randn(1, n, c).astype(np.float32))
    lo, hi = reps
    flops = n * n * (3 * c + 4 * k)  # dist build + k extraction rounds
    bytes_ = n * (4 * c + 8 * k)
    from egnn_tpu.ops.pallas.knn import knn_candidates_packed_tiled

    cases = [
        ("knn_pallas", lambda x: knn_select_pallas(x, k)),
        ("knn_tiled", lambda x: knn_select_pallas_tiled(x, k)),
        # candidates-only cost of the deferred-merge packed kernel (the
        # n>16384 auto default; add ~0.5-2 ms of XLA refine for end-to-end)
        ("knn_packed_tiled", lambda x: knn_candidates_packed_tiled(x, k + 4)),
    ]
    if include_xla:  # at n >= 32k the (n, n) distance matrix stops fitting
        cases.append(("knn_xla", lambda x: nb.select_neighborhood(
            nb.knn_ranking(nb.pairwise_geometry(x)[1]), k, 0.0)[:2]))
    out = []
    for name, fn in cases:
        t = measure_op(fn, coors, reps_lo=lo, reps_hi=hi)
        out.append(Roofline(f"{name}[n={n},k={k}]", t, flops=flops, bytes_accessed=bytes_))
    return out


def bench_segment(e=8192, n=1024, d=16, reps=(200, 1000)):
    rng = np.random.RandomState(0)
    data = jnp.asarray(rng.randn(e, d).astype(np.float32))
    ids = jnp.sort(jnp.asarray(rng.randint(0, n, size=(e,)).astype(np.int32)))
    ids_shuf = jnp.asarray(
        rng.permutation(np.asarray(ids)).astype(np.int32)
    )
    from egnn_tpu.ops.pallas.segment import segment_sum_pallas

    lo, hi = reps
    out = []
    for name, f in (
        ("segsum_pallas", lambda x: segment_sum_pallas(x, ids_shuf, n)),
        ("segsum_xla_sorted", lambda x: jax.ops.segment_sum(x, ids, num_segments=n)),
        ("segsum_xla_shuffled",
         lambda x: jax.ops.segment_sum(x, ids_shuf, num_segments=n)),
    ):
        t = measure_op(f, data, reps_lo=lo, reps_hi=hi)
        out.append(
            Roofline(
                f"{name}[E={e},N={n},D={d}]", t,
                flops=e * d, bytes_accessed=(2 * e * d + n * d) * 4 + e * 4,
            )
        )
    return out


def bench_stream_layer(n=2048, d=64):
    from egnn_tpu import EGNN

    key = jax.random.PRNGKey(0)
    feats = jax.random.normal(key, (1, n, d), jnp.float32)
    coors = jax.random.normal(jax.random.PRNGKey(1), (1, n, 3), jnp.float32)
    layer = EGNN(dim=d, norm_coors=True, stream_pairwise=True)
    params = jax.jit(layer.init)(key, feats, coors)

    hidden = 2 * (2 * d + 1)
    m = 16
    pair_flops = 2 * hidden * m + 2 * m * 4 * m + 2 * 4 * m  # edge MLP + coors MLP
    flops_fwd = n * n * pair_flops

    def fwd(f):
        fo, co = layer.apply(params, f, coors)
        return fo.sum() + co.sum()

    def fwdbwd(f):
        def L(p):
            fo, co = layer.apply(p, f, coors)
            return (fo**2).mean() + (co**2).mean()
        return jax.value_and_grad(L)(params)

    t_fwd = measure_op(fwd, feats, 10, 40)
    t_fb = measure_op(fwdbwd, feats, 10, 40)
    return [
        Roofline(f"stream_layer_fwd[n={n},d={d}]", t_fwd, flops=flops_fwd),
        Roofline(f"stream_layer_fwd+bwd[n={n},d={d}]", t_fb, flops=3 * flops_fwd),
    ]


def bench_fused_vs_xla_pair_pipeline(n=1024, k=8, d=32):
    """Reproduces the measured-outcome note in ops/pallas/knn_layer.py."""
    from egnn_tpu import EGNN

    key = jax.random.PRNGKey(0)
    feats = jax.random.normal(key, (1, n, d), jnp.float32)
    coors = jax.random.normal(jax.random.PRNGKey(1), (1, n, 3), jnp.float32)
    out = []
    for name, fused in (("layer_xla_pipeline", False), ("layer_fused_kernel", True)):
        layer = EGNN(dim=d, num_nearest_neighbors=k, norm_coors=True,
                     fused_knn=fused)
        params = jax.jit(layer.init)(key, feats, coors)

        def fwdbwd(f, layer=layer, params=params):
            def L(p):
                fo, co = layer.apply(p, f, coors)
                return (fo**2).mean() + (co**2).mean()
            return jax.value_and_grad(L)(params)

        t = measure_op(fwdbwd, feats, 30, 120)
        out.append(Roofline(f"{name}[n={n},k={k},d={d}]", t))
    return out


def bench_fused_uniform_sparse(n=1024, k=8, d=64):
    """Round 3: the fused uniform-degree sparse pipeline
    (EGNNSparse(fused_uniform=True), ops/pallas/pair_messages.py) vs the XLA
    per-edge path, layer fwd+bwd on the anchor-5-like shape."""
    from egnn_tpu import EGNNSparse

    key = jax.random.PRNGKey(0)
    i = jnp.repeat(jnp.arange(n, dtype=jnp.int32), k)
    j = (i + 1 + jnp.tile(jnp.arange(k, dtype=jnp.int32), n)) % n
    ei = jnp.stack([j, i])
    x = jnp.concatenate([
        jax.random.normal(key, (n, 3), jnp.float32),
        0.5 * jax.random.normal(jax.random.PRNGKey(1), (n, d), jnp.float32),
    ], axis=-1)
    out = []
    for name, fused in (("sparse_xla_edges", False), ("sparse_fused_kernel", True)):
        layer = EGNNSparse(feats_dim=d, uniform_degree=k, fourier_features=4,
                           norm_coors=True, fused_uniform=fused)
        params = jax.jit(layer.init)(key, x, ei)

        def fwdbwd(xx, layer=layer, params=params):
            def L(p):
                o = layer.apply(p, xx, ei)
                return (o ** 2).mean()
            return jax.value_and_grad(L)(params)

        t = measure_op(fwdbwd, x, 30, 120)
        out.append(Roofline(f"{name}[n={n},k={k},d={d}]", t))
    return out


def bench_grid_selection(n=16384, k=16, reps=(20, 80)):
    """Round-4 grid-blocked selection kernel (certified path) vs the exact
    quadratic kernels. Binding engine: VPU ops over the (n, 27*M_CAP)
    candidate band (the point of the kernel is that this band is ~27*128
    wide instead of n — op model below), plus the cell-table build."""
    from egnn_tpu.ops.pallas.grid_knn import (M_CAP, grid_knn_select_pallas,
                                              supports_grid_knn)

    if not supports_grid_knn(n, k):
        return []
    rng = np.random.RandomState(1)
    coors = jnp.asarray(rng.rand(1, n, 3).astype(np.float32) * 20.0)
    C = 27 * M_CAP
    flops = n * C * (3 * 3 + 4 * k)          # dist build + k extraction
    bytes_ = (n * C * 3 + n * 4) * 4         # candidate reads + tables
    lo, hi = reps
    t = measure_op(lambda x: grid_knn_select_pallas(x, k)[:2], coors,
                   reps_lo=lo, reps_hi=hi)
    return [Roofline(f"grid_select[n={n},k={k}]", t, flops=flops,
                     bytes_accessed=bytes_)]


def bench_query_repair(n=16384, k=16, reps=(20, 80)):
    """Round-4 asymmetric query-vs-points repair kernel (R = n/16 bucket,
    full scan) and the round-5 WINDOWED variant (W = n/4 x-sorted window).
    Binding engine: VPU ops over the (R, n) / (R, W) bands."""
    from egnn_tpu.ops.pallas.knn import (knn_select_queries_pallas,
                                         knn_select_window_pallas,
                                         supports_pallas_knn_queries,
                                         supports_pallas_knn_window)

    out = []
    if not supports_pallas_knn_queries(n):
        return out
    R = max(128, n // 16)
    rng = np.random.RandomState(2)
    pts = jnp.asarray(rng.randn(1, n, 3).astype(np.float32))
    q = pts[:, :R]
    lo, hi = reps
    t = measure_op(lambda x: knn_select_queries_pallas(x, pts, k)[0].sum(),
                   q, reps_lo=lo, reps_hi=hi)
    out.append(Roofline(f"repair_fullscan[R={R},n={n},k={k}]", t,
                        flops=R * n * (3 * 3 + 4 * k),
                        bytes_accessed=(R + n) * 3 * 4))
    W = min(-(-(n // 4) // 128) * 128, n)
    if supports_pallas_knn_window(n, W):
        order = jnp.argsort(pts[..., 0], axis=1).astype(jnp.int32)
        pts_s = jnp.take_along_axis(pts, order[..., None], axis=1)
        rank = jax.vmap(lambda oo: jnp.zeros((n,), jnp.int32).at[oo].set(
            jnp.arange(n, dtype=jnp.int32)))(order)
        qranks = jnp.sort(rank[:, :R], axis=1)
        qs = jnp.take_along_axis(
            pts_s, jnp.sort(qranks, axis=1)[..., None], axis=1)
        t2 = measure_op(
            lambda x: knn_select_window_pallas(
                x, qranks, pts_s, order, k, W)[0].sum(),
            qs, reps_lo=lo, reps_hi=hi)
        out.append(Roofline(f"repair_window[R={R},W={W},k={k}]", t2,
                            flops=R * W * (3 * 3 + 4 * k),
                            bytes_accessed=(R + n) * 3 * 4))
    return out


def bench_gather_rows_blocked(G=32, NA=32, K=8, D=64, reps=(100, 500)):
    """Round-4b block-local one-hot MXU gather (uniform_graph_size) vs the
    plain row gather, fwd+bwd. Binding: HBM for the plain gather (random
    rows); the blocked variant trades index-bound gathers for MXU flops
    (2*E*NA*D per one-hot matmul, bit-exact under HIGHEST)."""
    from egnn_tpu.ops.core import gather_rows, gather_rows_blocked

    rng = np.random.RandomState(3)
    N, E = G * NA, G * NA * K
    vals = jnp.asarray(rng.randn(N, D).astype(np.float32))
    local = rng.randint(0, NA, size=(G, E // G))
    idx = jnp.asarray(
        (local + np.arange(G)[:, None] * NA).reshape(-1).astype(np.int32))
    lo, hi = reps
    out = []
    for name, f in (
        ("gather_rows_plain",
         lambda v: jax.grad(lambda vv: (gather_rows(vv, idx) ** 2).sum())(v)),
        ("gather_rows_blocked",
         lambda v: jax.grad(lambda vv: (
             gather_rows_blocked(vv, idx, G, NA) ** 2).sum())(v)),
    ):
        t = measure_op(f, vals, reps_lo=lo, reps_hi=hi)
        out.append(Roofline(
            f"{name}[E={E},D={D}]", t,
            flops=2 * 2 * E * NA * D if "blocked" in name else E * D,
            bytes_accessed=2 * 2 * E * D * 4,
        ))
    return out


def bench_uniform_layernorm(G=32, NA=32, D=64, reps=(100, 500)):
    """Round-4b reshape-stat graph LayerNorm (uniform_size) vs the general
    segment-scatter path, fwd+bwd. Binding: HBM streaming either way; the
    uniform path removes the per-node stat gathers (index-bound class)."""
    from egnn_tpu.ops.segment import graph_layer_norm

    rng = np.random.RandomState(4)
    N = G * NA
    x = jnp.asarray(rng.randn(N, D).astype(np.float32))
    batch = jnp.repeat(jnp.arange(G, dtype=jnp.int32), NA)
    gamma = jnp.ones((D,))
    beta = jnp.zeros((D,))
    lo, hi = reps
    out = []
    for name, us in (("graph_ln_general", None), ("graph_ln_uniform", NA)):
        def f(v, us=us):
            return jax.grad(lambda vv: (graph_layer_norm(
                vv, batch, G, gamma, beta, uniform_size=us) ** 2).sum())(v)
        t = measure_op(f, x, reps_lo=lo, reps_hi=hi)
        out.append(Roofline(f"{name}[N={N},D={D}]", t,
                            flops=6 * N * D,
                            bytes_accessed=4 * N * D * 4))
    return out


def bench_fused_select_gather(n=1024, k=8, d=32, reps=(100, 500)):
    """Round-5 fused selection + in-kernel payload gather vs select + XLA
    gather (forward) — the layer-level fwd+bwd decision lives in
    benchmarks/ab_fused_gather.py; these are the op-level roofline rows."""
    from egnn_tpu.ops.core import gather_nodes
    from egnn_tpu.ops.pallas.knn import (knn_select_gather_pallas,
                                         knn_select_pallas,
                                         supports_pallas_knn_gather)

    tw = 3 + 1 + d
    if not supports_pallas_knn_gather(n, tw, k):
        return []
    rng = np.random.RandomState(5)
    coors = jnp.asarray(rng.randn(1, n, 3).astype(np.float32))
    table = jnp.asarray(rng.randn(1, n, tw).astype(np.float32))
    lo, hi = reps
    out = []
    t1 = measure_op(
        lambda x: gather_nodes(table, knn_select_pallas(x, k)[1]).sum(),
        coors, reps_lo=lo, reps_hi=hi)
    out.append(Roofline(f"select+xla_gather[n={n},k={k},tw={tw}]", t1,
                        flops=n * n * (9 + 4 * k),
                        bytes_accessed=(n * tw + n * k * tw) * 4))
    t2 = measure_op(
        lambda x: knn_select_gather_pallas(x, k, table)[2].sum(),
        coors, reps_lo=lo, reps_hi=hi)
    out.append(Roofline(
        f"fused_select_gather[n={n},k={k},tw={tw}]", t2,
        flops=n * n * (9 + 4 * k) + 2 * n * n * k * tw,  # + one-hot matmuls
        bytes_accessed=(n * tw + n * k * tw) * 4))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()
    print(f"backend: {jax.default_backend()}  device: {jax.devices()[0]}")

    results = []
    reps = (100, 500) if args.quick else (200, 1000)
    results += bench_knn(reps=reps)
    results += bench_segment(reps=reps)
    if not args.quick:
        results += bench_knn(n=4096, k=16, reps=(50, 200))
        results += bench_knn(n=16384, k=8, reps=(5, 25))
        results += bench_stream_layer()
        results += bench_fused_vs_xla_pair_pipeline()
        results += bench_fused_uniform_sparse()
        results += bench_grid_selection()
        results += bench_query_repair()
        results += bench_gather_rows_blocked()
        results += bench_uniform_layernorm()
        results += bench_fused_select_gather()
    for r in results:
        print(r.report())


if __name__ == "__main__":
    main()
