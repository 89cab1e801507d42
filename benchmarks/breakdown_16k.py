"""Cost breakdown of the n=16384 flagship regime (VERDICT round-2 item 1).

Measures, on the real TPU chip, where the 47.5 ms depth-3 fwd+bwd goes:
selection kernel, gathers, message MLP, full layer fwd, layer fwd+bwd,
network fwd+bwd. Run: timeout 900 python benchmarks/breakdown_16k.py
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from egnn_tpu import EGNN, EGNNNetwork
from egnn_tpu.ops import neighbors as nb
from egnn_tpu.ops.core import gather_nodes
from egnn_tpu.utils.profiling import measure_op

N = 16384
K = 16
DIM = 32
B = 1

key = jax.random.PRNGKey(0)
coors = jax.random.normal(key, (B, N, 3), jnp.float32) * 10.0
feats = jax.random.normal(jax.random.PRNGKey(1), (B, N, DIM), jnp.float32)


def meas(name, fn, x, lo=10, hi=40):
    s = measure_op(fn, x, reps_lo=lo, reps_hi=hi, reps_outer=2)
    print(f"{name:42s} {s*1e3:9.3f} ms")
    return s


# 1. selection alone
def sel(c):
    nbhd = nb.knn_select(c, K, float("inf"))
    return nbhd.indices.astype(jnp.float32) * 1e-6 + nbhd.ranking * 1e-9

meas("knn_select (pallas, fwd)", jax.jit(sel), coors)


# 2. gather feats_j (b,n,k,dim) via custom-vjp gather
def gath(c):
    nbhd = nb.knn_select(c, K, float("inf"))
    return gather_nodes(feats, nbhd.indices).sum(axis=-1) * 1e-6

meas("select + gather feats_j", jax.jit(gath), coors)

# 3. full layer fwd
layer = EGNN(dim=DIM, num_nearest_neighbors=K)
params = layer.init(jax.random.PRNGKey(2), feats, coors)

def layer_fwd(c):
    f, co = layer.apply(params, feats, c)
    return f.sum() * 1e-6 + co.sum() * 1e-6

meas("layer fwd", jax.jit(layer_fwd), coors)

# 4. layer fwd+bwd wrt (params, feats, coors)
def layer_loss(p, f_in, c):
    f, co = layer.apply(p, f_in, c)
    return (f**2).mean() + (co**2).mean()

g_layer = jax.jit(jax.grad(layer_loss, argnums=(0, 1, 2)))

def layer_fb(c):
    gp, gf, gc = g_layer(params, feats, c)
    return gc.sum() * 1e-6

meas("layer fwd+bwd", jax.jit(layer_fb), coors)

# 5. network depth-3 fwd+bwd (the BASELINE.md 47.5 ms row)
net = EGNNNetwork(depth=3, dim=DIM,
                  layer_kwargs=dict(num_nearest_neighbors=K,
                                    norm_coors=True,
                                    coor_weights_clamp_value=2.0))
nparams = net.init(jax.random.PRNGKey(3), feats, coors)

def net_loss(p, f_in, c):
    f, co = net.apply(p, f_in, c)
    return (f**2).mean() + (co**2).mean()

g_net = jax.jit(jax.grad(net_loss, argnums=(0, 1, 2)))

def net_fb(c):
    gp, gf, gc = g_net(nparams, feats, c)
    return gc.sum() * 1e-6

s = meas("network depth-3 fwd+bwd", jax.jit(net_fb), coors, lo=5, hi=20)
print(f"edges/s: {B * N * K * 3 / s / 1e6:.1f} M")
