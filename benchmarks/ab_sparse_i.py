"""Anchor-5 (sparse molecules) attribution + A/B of the per-node i-side
projection under uniform_degree.

Parts, all measured in ONE tunnel session (slope discipline):

  i_old / i_new   micro A/B: per-edge matmul on broadcast i rows vs
                  per-node projection + broadcast add (fwd+bwd wrt feats)
  gather          the xg_j combined row gather (fwd+bwd)
  pipe            per-edge message pipeline alone (pre-gathered, fwd+bwd)
  net_fwd         4-layer EGNNSparseNetwork forward (bf16 arm)
  net_fb          4-layer fwd+bwd wrt x  (the anchor-5 record number)

Run: timeout 590 python benchmarks/ab_sparse_i.py [part ...]
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from egnn_tpu.models.egnn_sparse import EGNNSparseNetwork
from egnn_tpu.ops.graph import knn_graph
from egnn_tpu.ops.core import gather_rows
from egnn_tpu.utils.profiling import measure_op

G, NA, K, DIM, LAYERS = 32, 32, 8, 64, 4
N = G * NA
E = N * K
EIN = 9 + 2 * DIM  # fourier=4 -> dist_dim 9
HID = 2 * EIN

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
    print(f"{name:24s} {s*1e6:9.1f} us", flush=True)
    return s


# ---- micro A/B: i-side projection, fwd+bwd wrt feats ----
w_i = jax.random.normal(jax.random.PRNGKey(2), (DIM, HID), jnp.float32) * 0.01
rest = jax.random.normal(jax.random.PRNGKey(3), (E, HID), jnp.float32)
bf = jnp.bfloat16

if want("i_old"):
    def i_old(feats):
        fi = jnp.broadcast_to(feats[:, None, :], (N, K, DIM)).reshape(E, DIM)
        h1 = fi.astype(bf) @ w_i.astype(bf) + rest.astype(bf)
        return (jax.nn.silu(h1).astype(jnp.float32) ** 2).mean()
    meas("i_old fwd+bwd", lambda f: jax.value_and_grad(i_old)(f)[1].sum() * 1e-6,
         jax.random.normal(jax.random.PRNGKey(4), (N, DIM), jnp.float32))

if want("i_new"):
    def i_new(feats):
        p = feats.astype(bf) @ w_i.astype(bf)
        h1 = jnp.broadcast_to(p[:, None, :], (N, K, HID)).reshape(E, HID) \
            + rest.astype(bf)
        return (jax.nn.silu(h1).astype(jnp.float32) ** 2).mean()
    meas("i_new fwd+bwd", lambda f: jax.value_and_grad(i_new)(f)[1].sum() * 1e-6,
         jax.random.normal(jax.random.PRNGKey(4), (N, DIM), jnp.float32))

# ---- gather cost ----
if want("gather"):
    j_idx = ei[0]
    def gat(xx):
        def l(v):
            return (gather_rows(v, j_idx) ** 2).mean()
        return jax.value_and_grad(l)(xx)[1].sum() * 1e-6
    meas("xg_j gather fwd+bwd", gat, x)

# ---- full network arms ----
common = dict(n_layers=LAYERS, feats_dim=1, embedding_nums=[5],
              embedding_dims=[DIM], fourier_features=4, norm_feats=True,
              norm_coors=True, uniform_degree=K,
              compute_dtype=jnp.bfloat16)
net = EGNNSparseNetwork(**common)
params = net.init(key, x, ei, batch=batch, edge_mask=em, num_graphs=G)["params"]

if want("net_fwd"):
    def nf(xx):
        o = net.apply({"params": params}, xx, ei, batch=batch, edge_mask=em,
                      num_graphs=G)
        return o.sum() * 1e-6
    meas("net fwd (bf16)", nf, x)

if want("net_fb"):
    def loss(xx):
        o = net.apply({"params": params}, xx, ei, batch=batch, edge_mask=em,
                      num_graphs=G)
        return (o[:, 3:] ** 2).mean()
    def fb(xx):
        l, g = jax.value_and_grad(loss)(xx)
        return g.sum() * 1e-6 + l
    s = meas("net fwd+bwd (bf16)", fb, x)
    print(f"anchor5 edges/s: {N * K * LAYERS / s / 1e6:.1f} M", flush=True)
