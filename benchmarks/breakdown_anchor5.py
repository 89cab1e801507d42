"""Fine-grained anchor-5 attribution (32 molecules x 32 atoms, kNN=8,
dim=64, 4 layers, uniform_degree, bf16 messages — the bench_all winner arm),
all parts measured in ONE tunnel session.

  gather      xg_j combined row gather, fwd+bwd (per layer)
  pipe        pre-gathered per-edge message pipeline + both uniform
              aggregations, fwd+bwd (per layer; no gather, no feature tail)
  gln         graph_layer_norm at (N, dim), G graphs, fwd+bwd (per layer)
  ftail       full feature-update tail: gln + node MLP residual (per layer)
  layer       one full EGNNSparse layer fwd+bwd
  net         4-layer network fwd+bwd (the anchor-5 record number)

Run: timeout 590 python benchmarks/breakdown_anchor5.py [part ...]
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from egnn_tpu.models.egnn_sparse import EGNNSparse, EGNNSparseNetwork
from egnn_tpu.ops.graph import knn_graph
from egnn_tpu.ops.core import gather_rows, fourier_encode_dist
from egnn_tpu.ops.segment import graph_layer_norm, uniform_aggregate
from egnn_tpu.utils.profiling import measure_op

G, NA, K, DIM, LAYERS = 32, 32, 8, 64, 4
N = G * NA
E = N * K
FOUR = 4
EIN = (2 * FOUR + 1) + 2 * DIM
HID = 2 * EIN
MD = 16

key = jax.random.PRNGKey(0)
coors = 2.0 * jax.random.normal(key, (G, NA, 3), jnp.float32)
types = jax.random.randint(jax.random.PRNGKey(1), (N, 1), 0, 5)
node_mask = jnp.ones((G, NA), bool)
es = jax.vmap(lambda co, m: knn_graph(co, K, node_mask=m))(coors, node_mask)
off = (jnp.arange(G, dtype=jnp.int32) * NA)[:, None]
ei = jnp.stack([(es.senders + off).reshape(-1), (es.receivers + off).reshape(-1)])
em = es.mask.reshape(-1)
batch = jnp.repeat(jnp.arange(G, dtype=jnp.int32), NA)
x = jnp.concatenate([coors.reshape(N, 3), types.astype(jnp.float32)], -1)

sel = set(sys.argv[1:])
want = lambda s: not sel or s in sel
print(f"backend: {jax.default_backend()}", flush=True)


def meas(name, fn, arg, lo=100, hi=400):
    s = measure_op(jax.jit(fn), arg, reps_lo=lo, reps_hi=hi, reps_outer=3)
    print(f"{name:26s} {s*1e6:9.1f} us", flush=True)
    return s


bf = jnp.bfloat16
j_idx = ei[0]
kf = jax.random.normal(jax.random.PRNGKey(5), (N, DIM), jnp.float32)

if want("gather"):
    xx = jnp.concatenate([coors.reshape(N, 3), kf], -1)
    def gat(v):
        def l(vv):
            return (gather_rows(vv, j_idx) ** 2).mean()
        return jax.value_and_grad(l)(v)[1].sum() * 1e-6
    meas("gather fwd+bwd", gat, xx)

if want("pipe"):
    ks = [jax.random.PRNGKey(10 + i) for i in range(8)]
    w_i = jax.random.normal(ks[0], (DIM, HID), jnp.float32) * 0.02
    w_j = jax.random.normal(ks[1], (DIM, HID), jnp.float32) * 0.02
    w_d = jax.random.normal(ks[2], (2 * FOUR + 1, HID), jnp.float32) * 0.02
    w2 = jax.random.normal(ks[3], (HID, MD), jnp.float32) * 0.02
    cw1 = jax.random.normal(ks[4], (MD, 4 * MD), jnp.float32) * 0.02
    cw2 = jax.random.normal(ks[5], (4 * MD, 1), jnp.float32) * 0.02
    cj = gather_rows(jnp.concatenate([coors.reshape(N, 3), kf], -1), j_idx)

    def pipe(feats):
        fi = jnp.broadcast_to(feats[:, None, :], (N, K, DIM)).reshape(E, DIM)
        ci = jnp.broadcast_to(
            coors.reshape(N, 3)[:, None, :], (N, K, 3)).reshape(E, 3)
        fj = cj[:, 3:]
        rel = cj[:, :3] - ci
        rd = (rel ** 2).sum(-1, keepdims=True)
        df = fourier_encode_dist(rd[:, 0], num_encodings=FOUR)
        h1 = (fi.astype(bf) @ w_i.astype(bf) + fj.astype(bf) @ w_j.astype(bf)
              + df.astype(bf) @ w_d.astype(bf))
        m = jax.nn.silu(jax.nn.silu(h1) @ w2.astype(bf))
        cwv = (jax.nn.silu(m @ cw1.astype(bf)) @ cw2.astype(bf)).astype(
            jnp.float32)
        cwv = jnp.clip(cwv, -2.0, 2.0)
        mh = uniform_aggregate("add", cwv * rel, K, mask=em)
        mi = uniform_aggregate("add", m.astype(jnp.float32), K, mask=em)
        return (mh ** 2).mean() + (mi ** 2).mean()

    def pfb(feats):
        l, g = jax.value_and_grad(pipe)(feats)
        return g.sum() * 1e-6 + l
    meas("pipe fwd+bwd", pfb, kf)

if want("gln"):
    gam = jnp.ones((DIM,))
    bet = jnp.zeros((DIM,))
    def gln(v):
        def l(vv):
            return (graph_layer_norm(vv, batch, G, gam, bet) ** 2).mean()
        return jax.value_and_grad(l)(v)[1].sum() * 1e-6
    meas("graph_layer_norm fwd+bwd", gln, kf)

common = dict(feats_dim=DIM, fourier_features=FOUR, norm_feats=True,
              norm_coors=True, uniform_degree=K, compute_dtype=jnp.bfloat16)

if want("layer"):
    lay = EGNNSparse(**common)
    xl = jnp.concatenate([coors.reshape(N, 3), kf], -1)
    pl = lay.init(key, xl, ei, batch=batch, edge_mask=em, num_graphs=G)["params"]
    def lfb(v):
        def l(vv):
            o = lay.apply({"params": pl}, vv, ei, batch=batch, edge_mask=em,
                          num_graphs=G)
            return (o[:, 3:] ** 2).mean()
        lv, g = jax.value_and_grad(l)(v)
        return g.sum() * 1e-6 + lv
    meas("layer fwd+bwd", lfb, xl)

if want("net"):
    net = EGNNSparseNetwork(n_layers=LAYERS, feats_dim=1, embedding_nums=[5],
                            embedding_dims=[DIM], fourier_features=FOUR,
                            norm_feats=True, norm_coors=True,
                            uniform_degree=K, compute_dtype=jnp.bfloat16)
    net_u = EGNNSparseNetwork(n_layers=LAYERS, feats_dim=1, embedding_nums=[5],
                              embedding_dims=[DIM], fourier_features=FOUR,
                              norm_feats=True, norm_coors=True,
                              uniform_degree=K, compute_dtype=jnp.bfloat16,
                              uniform_graph_size=NA)
    params = net.init(key, x, ei, batch=batch, edge_mask=em, num_graphs=G)["params"]
    def loss(xx):
        o = net.apply({"params": params}, xx, ei, batch=batch, edge_mask=em,
                      num_graphs=G)
        return (o[:, 3:] ** 2).mean()
    def fb(xx):
        l, g = jax.value_and_grad(loss)(xx)
        return g.sum() * 1e-6 + l
    s = meas("net fwd+bwd", fb, x)
    print(f"anchor5 edges/s: {N * K * LAYERS / s / 1e6:.1f} M", flush=True)

    def loss_u(xx):
        o = net_u.apply({"params": params}, xx, ei, batch=batch, edge_mask=em,
                        num_graphs=G)
        return (o[:, 3:] ** 2).mean()
    def fb_u(xx):
        l, g = jax.value_and_grad(loss_u)(xx)
        return g.sum() * 1e-6 + l
    su = meas("net fwd+bwd (ugs)", fb_u, x)
    print(f"anchor5 edges/s (ugs): {N * K * LAYERS / su / 1e6:.1f} M",
          flush=True)

    import numpy as np
    a = jax.jit(fb)(x)
    b = jax.jit(fb_u)(x)
    print(f"parity |a-b| = {abs(float(a) - float(b)):.2e}", flush=True)
