"""A/B the spatial-grid pruned kNN (ops/spatial.py, backend="grid") against
the shipping dispatch, selection-only and at the network level (depth-3
fwd+bwd wrt coords, slope-timed, within one session).

The grid path replaces the O(n^2) ranking band with O(n * 27 * m_cap)
candidates + a per-call exactness certificate (uniform data certifies;
failure lax.conds to the exact kernels, so the fallback arm measures the
certified-path cost PLUS nothing — the cond's untaken branch is free at
runtime aside from compilation).

Selection rows use uniform clouds (certify) so the grid branch is the one
timed; the net rows exercise the full dispatch through the layer.

Run on the TPU: timeout 590 python benchmarks/ab_grid.py [4096 16384 65536]
"""
import functools
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from egnn_tpu import EGNNNetwork
from egnn_tpu.ops import neighbors as nb
from egnn_tpu.ops.pallas.grid_knn import (grid_knn_select_pallas,
                                          supports_grid_knn)
from egnn_tpu.ops.spatial import grid_knn_select
from egnn_tpu.utils.profiling import measure_op

K, DIM, B, DEPTH = 16, 32, 1, 3
orig = nb.knn_select_gather


def sel_arm(name, n, fn, lo=5, hi=20):
    coors = jax.random.uniform(jax.random.PRNGKey(0), (B, n, 3),
                               jnp.float32) * 10.0

    def run(c):
        out = fn(c)
        return sum(jnp.sum(o.astype(jnp.float32)) * 1e-9 for o in out)

    s = measure_op(jax.jit(run), coors, reps_lo=lo, reps_hi=hi, reps_outer=2)
    print(f"n={n:6d} sel {name:12s}: {s*1e3:8.2f} ms", flush=True)
    return s


def net_arm(name, n, backend=None, lo=5, hi=20):
    coors = jax.random.uniform(jax.random.PRNGKey(0), (B, n, 3),
                               jnp.float32) * 10.0
    feats = jax.random.normal(jax.random.PRNGKey(1), (B, n, DIM), jnp.float32)
    net = EGNNNetwork(depth=DEPTH, dim=DIM,
                      layer_kwargs=dict(num_nearest_neighbors=K,
                                        norm_coors=True,
                                        coor_weights_clamp_value=2.0))
    p = net.init(jax.random.PRNGKey(3), feats, coors)

    @functools.wraps(orig)
    def patched(*a, **kw):
        if backend is not None:
            kw["backend"] = backend
        return orig(*a, **kw)

    nb.knn_select_gather = patched
    try:
        def loss(pp, f_in, c):
            f, co = net.apply(pp, f_in, c)
            return (f**2).mean() + (co**2).mean()

        g = jax.jit(jax.grad(loss, argnums=(2,)))

        def fb(c):
            (gc,) = g(p, feats, c)
            return gc.sum() * 1e-6

        s = measure_op(jax.jit(fb), coors, reps_lo=lo, reps_hi=hi,
                       reps_outer=2)
    finally:
        nb.knn_select_gather = orig
    eps = B * n * K * DEPTH / s
    print(f"n={n:6d} net {name:12s}: {s*1e3:8.2f} ms -> {eps/1e6:6.1f} M edges/s",
          flush=True)
    return s


def _try(fn, *a, **kw):
    """One failed arm must not kill the session's remaining measurements
    (the jnp-grid arm OOMs HBM at n>=16384: its (n, 27*m_cap, 3) candidate
    tensor pads 3 lanes -> 128 on TPU, 21.7 GB)."""
    try:
        return fn(*a, **kw)
    except Exception as e:
        name, n = a[0], a[1]
        print(f"n={n:6d} {name:12s}: FAILED ({type(e).__name__}: "
              f"{str(e)[:120]})", flush=True)
        return None


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [4096, 16384]
    print(f"backend: {jax.default_backend()}")
    for n in sizes:
        lo, hi = (2, 8) if n > 16384 else (5, 20)
        if supports_grid_knn(n, K):
            _try(sel_arm, "grid_kernel", n,
                 lambda c: grid_knn_select_pallas(c, K)[:2], lo=lo, hi=hi)
            _try(sel_arm, "grid_streamed", n,
                 lambda c: grid_knn_select_pallas(c, K, streamed=True)[:2],
                 lo=lo, hi=hi)
        if n < 16384:  # (n, 27*m_cap, 3) lane padding OOMs beyond
            _try(sel_arm, "grid_jnp", n, lambda c: grid_knn_select(c, K)[:2],
                 lo=lo, hi=hi)
        _try(sel_arm, "exact(auto)", n,
             lambda c: nb.knn_select(c, K, float("inf"))[:2], lo=lo, hi=hi)
        _try(net_arm, "auto", n, lo=lo, hi=hi)
        _try(net_arm, "grid", n, backend="grid", lo=lo, hi=hi)


if __name__ == "__main__":
    main()
