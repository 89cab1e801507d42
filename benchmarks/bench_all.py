"""All five BASELINE.md anchor configurations, fwd+bwd wall time on the
attached TPU (slope-based timing; see utils/profiling.py). The driver-facing
headline stays bench.py (config 3); this harness documents the full surface.

Run: python benchmarks/bench_all.py
"""
from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from egnn_tpu import EGNN, EGNNNetwork, EGNNSparseNetwork
from egnn_tpu.ops.graph import knn_graph
from egnn_tpu.utils.profiling import measure_op


def _grad_time(loss_fn, x, lo=30, hi=120):
    vg = jax.value_and_grad(loss_fn, argnums=0)
    return measure_op(lambda xx: vg(xx), x, reps_lo=lo, reps_hi=hi)


def config1_layer(edge_dim=0):
    """Anchor 1/2: single dense EGNN layer, dim=512, 16 nodes (README:17-46)."""
    n, d = 16, 512
    key = jax.random.PRNGKey(0)
    feats = jax.random.normal(key, (1, n, d), jnp.float32)
    coors = jax.random.normal(jax.random.PRNGKey(1), (1, n, 3), jnp.float32)
    edges = (
        jax.random.normal(jax.random.PRNGKey(2), (1, n, n, edge_dim), jnp.float32)
        if edge_dim else None
    )
    layer = EGNN(dim=d, edge_dim=edge_dim)
    params = jax.jit(layer.init)(key, feats, coors, edges)

    def loss(f):
        fo, co = layer.apply(params, f, coors, edges)
        return (fo**2).mean() + (co**2).mean()

    # us-scale op: long chains so tunnel jitter (~ms) can't swamp the slope
    t = _grad_time(loss, feats, lo=1000, hi=4000)
    return dict(name=f"anchor{1 if not edge_dim else 2}_layer_dim512_n16"
                + ("_edges4" if edge_dim else ""),
                fwd_bwd_us=round(t * 1e6, 1), pairs_per_s=round(n * n / t))


def config3_flagship():
    from egnn_tpu.training.data import synthetic_chain_batch

    n, k_, depth = 1024, 8, 3
    key = jax.random.PRNGKey(0)
    b = synthetic_chain_batch(key, 1, n)
    net = EGNNNetwork(depth=depth, dim=32, num_tokens=21, num_positions=n,
                      layer_kwargs=dict(num_nearest_neighbors=k_,
                                        norm_coors=True,
                                        coor_weights_clamp_value=2.0))
    params = jax.jit(net.init)(key, b.tokens, b.noised_coors,
                               adj_mat=b.adj_mat, mask=b.mask)["params"]

    def loss(co):
        f, d_ = net.apply({"params": params}, b.tokens, co,
                          adj_mat=b.adj_mat, mask=b.mask)
        return ((d_ - b.clean_coors) ** 2).mean()

    t = measure_op(lambda co: jax.value_and_grad(loss)(co), b.noised_coors,
                   50, 200)
    return dict(name="anchor3_network_n1024_knn8_depth3",
                fwd_bwd_us=round(t * 1e6, 1),
                edges_per_s=round(n * k_ * depth / t))


def config3_saturated(batch=8):
    """VERDICT r4 item 7: the flagship config is latency/index-bound at
    b=1; this arm records edges/s/chip at batch saturation (same n=1024
    kNN=8 depth-3 network, b=8) so the framework's throughput CEILING is
    on record, not just its small-model latency. Not a driver metric."""
    from egnn_tpu.training.data import synthetic_chain_batch

    n, k_, depth = 1024, 8, 3
    key = jax.random.PRNGKey(0)
    b = synthetic_chain_batch(key, batch, n)
    net = EGNNNetwork(depth=depth, dim=32, num_tokens=21, num_positions=n,
                      layer_kwargs=dict(num_nearest_neighbors=k_,
                                        norm_coors=True,
                                        coor_weights_clamp_value=2.0))
    params = jax.jit(net.init)(key, b.tokens, b.noised_coors,
                               adj_mat=b.adj_mat, mask=b.mask)["params"]

    def loss(co):
        f, d_ = net.apply({"params": params}, b.tokens, co,
                          adj_mat=b.adj_mat, mask=b.mask)
        return ((d_ - b.clean_coors) ** 2).mean()

    t = measure_op(lambda co: jax.value_and_grad(loss)(co), b.noised_coors,
                   20, 80)
    return dict(name=f"anchor3_saturated_b{batch}_n1024_knn8_depth3",
                fwd_bwd_us=round(t * 1e6, 1),
                edges_per_s=round(batch * n * k_ * depth / t))


def config4_only_sparse():
    n, depth = 512, 2
    key = jax.random.PRNGKey(0)
    tokens = jax.random.randint(key, (1, n), 0, 21)
    coors = jax.random.normal(jax.random.PRNGKey(1), (1, n, 3), jnp.float32)
    ar = jnp.arange(n)
    adj = jnp.abs(ar[:, None] - ar[None, :]) == 1
    net = EGNNNetwork(depth=depth, dim=32, num_tokens=21,
                      num_adj_degrees=3, adj_dim=8,
                      layer_kwargs=dict(only_sparse_neighbors=True,
                                        num_nearest_neighbors=7))
    params = jax.jit(net.init)(key, tokens, coors, adj_mat=adj)["params"]

    def loss(co):
        f, d_ = net.apply({"params": params}, tokens, co, adj_mat=adj)
        return (d_**2).mean()

    t = measure_op(lambda co: jax.value_and_grad(loss)(co), coors, 30, 120)
    return dict(name="anchor4_only_sparse_adj3_n512", fwd_bwd_us=round(t * 1e6, 1))


def config5_sparse_molecules():
    G, NA, K, dim, layers = 32, 32, 8, 64, 4
    N = G * NA
    key = jax.random.PRNGKey(0)
    coors = 2.0 * jax.random.normal(key, (G, NA, 3), jnp.float32)
    types = jax.random.randint(jax.random.PRNGKey(1), (N, 1), 0, 5)
    node_mask = jnp.ones((G, NA), bool)
    es = jax.vmap(lambda co, m: knn_graph(co, K, node_mask=m))(coors, node_mask)
    off = (jnp.arange(G, dtype=jnp.int32) * NA)[:, None]
    ei = jnp.stack([(es.senders + off).reshape(-1),
                    (es.receivers + off).reshape(-1)])
    em = es.mask.reshape(-1)
    batch = jnp.repeat(jnp.arange(G, dtype=jnp.int32), NA)
    x = jnp.concatenate([coors.reshape(N, 3), types.astype(jnp.float32)], -1)

    common = dict(n_layers=layers, feats_dim=1,
                  embedding_nums=[5], embedding_dims=[dim],
                  fourier_features=4, norm_feats=True, norm_coors=True)
    out = {}
    # Arms: general segment path; uniform-degree (default = XLA per-edge,
    # the round-2 measured path); + bf16 message MLPs; + the fused Pallas
    # pair pipeline (round 3, decides the fused_uniform auto default).
    for label, extra in (
        ("", {}),
        ("_uniformk", dict(uniform_degree=K)),
        ("_uniformk_bf16",
         dict(uniform_degree=K, compute_dtype=jnp.bfloat16)),
        ("_uniformk_bf16_ugs",
         dict(uniform_degree=K, compute_dtype=jnp.bfloat16,
              uniform_graph_size=NA)),
        ("_uniformk_fused", dict(uniform_degree=K, fused_uniform=True)),
    ):
        net = EGNNSparseNetwork(**common, **extra)
        params = net.init(key, x, ei, batch=batch, edge_mask=em,
                          num_graphs=G)["params"]

        def loss(xx, net=net, params=params):
            o = net.apply({"params": params}, xx, ei, batch=batch,
                          edge_mask=em, num_graphs=G)
            return (o[:, 3:] ** 2).mean()

        t = measure_op(lambda xx, l=loss: jax.value_and_grad(l)(xx), x, 30, 120)
        out[f"fwd_bwd_us{label}"] = round(t * 1e6, 1)
        out[f"edges_per_s{label}"] = round(N * K * layers / t)
    return dict(name="anchor5_sparse_32molecules_knn8_4layers", **out)


def main():
    print(f"backend: {jax.default_backend()}  device: {jax.devices()[0]}")
    results = []
    for fn in (lambda: config1_layer(0), lambda: config1_layer(4),
               config3_flagship, config3_saturated, config4_only_sparse,
               config5_sparse_molecules):
        r = fn()
        results.append(r)
        print(json.dumps(r))


if __name__ == "__main__":
    main()
