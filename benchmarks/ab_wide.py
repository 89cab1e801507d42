"""A/B the WIDE packed-candidate path (kc slots + winner mask, round 3)
against the exact kernels and the old compacted packed path, at the network
level (depth-3 fwd+bwd wrt coords, slope-timed, within one session).

Arms per size:
  auto        — the shipping dispatch (n<=16384: exact kernels; n>16384:
                packed-tiled + wide winner mask)
  packed_wide — force backend="packed"/"packed_tiled" with wide=True
  packed_flat — force the same backend with wide=False (old compaction)
  exact       — force the exact kernel ("pallas" full-band / "tiled")

Run on the TPU: timeout 590 python benchmarks/ab_wide.py [16384] [65536]
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
from egnn_tpu.utils.profiling import measure_op

K, DIM, B, DEPTH = 16, 32, 1, 3
orig = nb.knn_select_gather


def arm(name, n, backend=None, wide=None, lo=5, hi=20, fused=False):
    coors = jax.random.normal(jax.random.PRNGKey(0), (B, n, 3), jnp.float32) * 10.0
    feats = jax.random.normal(jax.random.PRNGKey(1), (B, n, DIM), jnp.float32)
    net = EGNNNetwork(depth=DEPTH, dim=DIM,
                      layer_kwargs=dict(num_nearest_neighbors=K,
                                        norm_coors=True,
                                        coor_weights_clamp_value=2.0,
                                        fused_pairs=fused))
    p = net.init(jax.random.PRNGKey(3), feats, coors)

    @functools.wraps(orig)
    def patched(*a, **kw):
        if backend is not None:
            kw["backend"] = backend
        if wide is not None:
            kw["wide"] = wide
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
    print(f"n={n:6d} {name:12s}: {s*1e3:8.2f} ms -> {eps/1e6:6.1f} M edges/s",
          flush=True)
    return s


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [16384]
    print(f"backend: {jax.default_backend()}")
    for n in sizes:
        if n <= 16384:
            arm("auto(exact)", n)
            arm("exact_fused", n, fused=True)
            arm("packed_wide", n, backend="packed", wide=True)
            arm("packed_w_fus", n, backend="packed", wide=True, fused=True)
            arm("packed_flat", n, backend="packed", wide=False)
        else:
            lo, hi = 2, 8
            arm("auto(wide)", n, lo=lo, hi=hi)
            arm("auto_w_fused", n, fused=True, lo=lo, hi=hi)
            arm("packed_flat", n, backend="packed_tiled", wide=False, lo=lo, hi=hi)
            arm("exact_tiled", n, backend="tiled", lo=lo, hi=hi)


if __name__ == "__main__":
    main()
