"""Round-2 BASELINE.md measurement batch — run in ONE TPU session so the
numbers share tunnel conditions. Covers:
1. flagship n=1024 network fwd+bwd (anchor 3 sanity)
2. n=16384 k=16 depth-3 network fwd+bwd (the round-2 large-n row)
3. n=65536 k=16 depth-3 network fwd+bwd (tiled-selection regime)
4. streamed all-pairs layer n=8192: f32 vs compute_dtype=bf16
5. 65536-node knn_graph device build (kernel-routed, no (N,N))
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import time

import jax
import jax.numpy as jnp

from egnn_tpu import EGNN, EGNNNetwork
from egnn_tpu.ops.graph import knn_graph
from egnn_tpu.utils.profiling import measure_op


def net_fb_time(n, k, depth=3, dim=32, lo=5, hi=20):
    coors = jax.random.normal(jax.random.PRNGKey(0), (1, n, 3), jnp.float32) * 10
    feats = jax.random.normal(jax.random.PRNGKey(1), (1, n, dim), jnp.float32)
    net = EGNNNetwork(depth=depth, dim=dim,
                      layer_kwargs=dict(num_nearest_neighbors=k,
                                        norm_coors=True,
                                        coor_weights_clamp_value=2.0))
    p = net.init(jax.random.PRNGKey(3), feats, coors)

    def loss(pp, f_in, c):
        f, co = net.apply(pp, f_in, c)
        return (f**2).mean() + (co**2).mean()

    g = jax.jit(jax.grad(loss, argnums=(2,)))

    def fb(c):
        (gc,) = g(p, feats, c)
        return gc.sum() * 1e-6

    s = measure_op(jax.jit(fb), coors, reps_lo=lo, reps_hi=hi, reps_outer=2)
    print(f"network n={n} k={k} depth={depth} fwd+bwd: {s*1e3:8.2f} ms "
          f"-> {n*k*depth/s/1e6:6.1f} M edges/s", flush=True)
    return s


def stream_ab(n=8192, dim=64):
    coors = jax.random.normal(jax.random.PRNGKey(0), (1, n, 3), jnp.float32)
    feats = jax.random.normal(jax.random.PRNGKey(1), (1, n, dim), jnp.float32)
    times = {}
    for cd in (None, jnp.bfloat16):
        layer = EGNN(dim=dim, stream_pairwise=True, norm_coors=True,
                     compute_dtype=cd)
        p = layer.init(jax.random.PRNGKey(2), feats, coors)

        def loss(c, layer=layer, p=p):
            f, co = layer.apply(p, feats, c)
            return (f**2).mean() + (co**2).mean()

        s = measure_op(jax.jit(jax.grad(loss)), coors, reps_lo=3, reps_hi=10,
                       reps_outer=2)
        nm = "bf16" if cd is not None else "f32 "
        times[nm] = s
        print(f"streamed all-pairs n={n} dim={dim} [{nm}] fwd+bwd: "
              f"{s*1e3:8.2f} ms ({n*n/s/1e9:.2f} G pairs/s)", flush=True)
    print(f"bf16 speedup: {times['f32 ']/times['bf16']:.2f}x", flush=True)


def build_65k(k=16):
    n = 65536
    coors = jax.random.normal(jax.random.PRNGKey(0), (n, 3), jnp.float32) * 20

    def build(c):
        e = knn_graph(c, k)
        return e.senders.sum() * 1e-9

    s = measure_op(jax.jit(build), coors, reps_lo=3, reps_hi=8, reps_outer=2)
    print(f"knn_graph n={n} k={k} device build: {s*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    t0 = time.time()
    net_fb_time(1024, 8, lo=20, hi=80)
    net_fb_time(16384, 16)
    net_fb_time(65536, 16, lo=2, hi=6)
    stream_ab()
    build_65k()
    print(f"total wall {time.time()-t0:.0f}s")
