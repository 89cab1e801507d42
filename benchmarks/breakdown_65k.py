"""Cost breakdown of the n=65536 regime (round 3): the packed-tiled
selection kernel is 88.7 ms of the measured 428.6 ms depth-3 fwd+bwd
(BASELINE.md) — the other ~162 ms have never been attributed. Measures
selection (auto = packed-tiled, and grid kernel), the combined gather,
layer fwd, layer fwd+bwd, network fwd+bwd, plus the network with
backend="grid" monkeypatched.

Run: timeout 900 python benchmarks/breakdown_65k.py [n]
"""
import functools
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from egnn_tpu import EGNN, EGNNNetwork
from egnn_tpu.ops import neighbors as nb
from egnn_tpu.ops.core import gather_nodes
from egnn_tpu.ops.pallas.grid_knn import grid_knn_select_pallas, supports_grid_knn
from egnn_tpu.utils.profiling import measure_op

N = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
K = 16
DIM = 32
B = 1

key = jax.random.PRNGKey(0)
coors = jax.random.uniform(key, (B, N, 3), jnp.float32) * 10.0
feats = jax.random.normal(jax.random.PRNGKey(1), (B, N, DIM), jnp.float32)


def meas(name, fn, x, lo=2, hi=8):
    s = measure_op(fn, x, reps_lo=lo, reps_hi=hi, reps_outer=2)
    print(f"{name:42s} {s*1e3:9.3f} ms", flush=True)
    return s


def sel(c):
    nbhd = nb.knn_select(c, K, float("inf"))
    return nbhd.indices.astype(jnp.float32).sum() * 1e-6


meas("knn_select auto (packed-tiled)", jax.jit(sel), coors)

if supports_grid_knn(N, K):
    # the measurement is only meaningful if the certificate PASSES (else
    # it times the O(n) early-skip, a spuriously huge 'win') — print it
    _, _, cert, _rx = jax.jit(
        lambda c: grid_knn_select_pallas(c, K))(coors)
    print(f"grid certificate on this cloud: {bool(cert)}", flush=True)

    def sel_grid(c):
        v, i, ok, _rx = grid_knn_select_pallas(c, K)
        return i.astype(jnp.float32).sum() * 1e-6 + ok.astype(jnp.float32)

    meas("grid kernel selection", jax.jit(sel_grid), coors)


def gath(c):
    nbhd = nb.knn_select(c, K, float("inf"))
    return gather_nodes(feats, nbhd.indices).sum(axis=-1).sum() * 1e-6


meas("select + gather feats_j", jax.jit(gath), coors)

layer = EGNN(dim=DIM, num_nearest_neighbors=K)
params = layer.init(jax.random.PRNGKey(2), feats, coors)


def layer_fwd(c):
    f, co = layer.apply(params, feats, c)
    return f.sum() * 1e-6 + co.sum() * 1e-6


meas("layer fwd", jax.jit(layer_fwd), coors)


def layer_loss(p, f_in, c):
    f, co = layer.apply(p, f_in, c)
    return (f**2).mean() + (co**2).mean()


g_layer = jax.jit(jax.grad(layer_loss, argnums=(2,)))


def layer_fb(c):
    (gc,) = g_layer(params, feats, c)
    return gc.sum() * 1e-6


meas("layer fwd+bwd (coor grads)", jax.jit(layer_fb), coors)

net = EGNNNetwork(depth=3, dim=DIM,
                  layer_kwargs=dict(num_nearest_neighbors=K,
                                    norm_coors=True,
                                    coor_weights_clamp_value=2.0))
nparams = net.init(jax.random.PRNGKey(3), feats, coors)


def net_loss(p, f_in, c):
    f, co = net.apply(p, f_in, c)
    return (f**2).mean() + (co**2).mean()


g_net = jax.jit(jax.grad(net_loss, argnums=(2,)))


def net_fb(c):
    (gc,) = g_net(nparams, feats, c)
    return gc.sum() * 1e-6


orig = nb.knn_select_gather
s = meas("network depth-3 fwd+bwd (auto)", jax.jit(net_fb), coors)
print(f"  -> {B * N * K * 3 / s / 1e6:.1f} M edges/s")


@functools.wraps(orig)
def patched(*a, **kw):
    kw["backend"] = "grid"
    return orig(*a, **kw)


nb.knn_select_gather = patched
try:
    g_net2 = jax.jit(jax.grad(net_loss, argnums=(2,)))

    def net_fb2(c):
        (gc,) = g_net2(nparams, feats, c)
        return gc.sum() * 1e-6

    s = meas("network depth-3 fwd+bwd (grid)", jax.jit(net_fb2), coors)
    print(f"  -> {B * N * K * 3 / s / 1e6:.1f} M edges/s")
finally:
    nb.knn_select_gather = orig
