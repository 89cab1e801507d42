"""Diagnose 16k selection routing: is GRID_AUTO engaging, does the
certificate hold, and what does each backend cost on uniform vs gaussian
clouds? Run: timeout 590 python benchmarks/grid_route_check.py"""
import sys
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from egnn_tpu.ops import neighbors as nb
from egnn_tpu.ops.pallas.grid_knn import supports_grid_knn, grid_kernel_gdim
from egnn_tpu.utils.profiling import measure_op

import numpy as np

sizes = [(16384, 16, 30, 120)]
if "65k" in sys.argv:
    sizes = [(65536, 16, 8, 32)]
for N, K, lo, hi in sizes:
    print(f"n={N} supports_grid_knn: {supports_grid_knn(N, K)} "
          f"gdim: {grid_kernel_gdim(N)}", flush=True)
    uni = jax.random.uniform(jax.random.PRNGKey(0), (1, N, 3), jnp.float32) * 20.0
    gau = jax.random.normal(jax.random.PRNGKey(0), (1, N, 3), jnp.float32) * 10.0
    for name, c in (("uniform", uni), ("gaussian", gau)):
        ref = None
        for be in ("auto", "grid") + (("full",) if N <= 16384 else ()):
            try:
                def sel(cc, b=be):
                    nbhd = nb.knn_select(cc, K, float("inf"), backend=b)
                    return nbhd.ranking.sum() * 1e-9
                s = measure_op(jax.jit(sel), c, reps_lo=lo, reps_hi=hi,
                               reps_outer=3)
                print(f"{name:9s} backend={be:5s} {s*1e3:7.2f} ms", flush=True)
            except Exception as e:
                print(f"{name:9s} backend={be:5s} FAILED {type(e).__name__} "
                      f"{str(e)[:120]}", flush=True)
        # exactness spot check: auto vs the exact tiled kernel indices
        got = jax.jit(lambda cc: nb.knn_select(
            cc, K, float("inf"), backend="auto").indices)(c)
        exact = jax.jit(lambda cc: nb.knn_select(
            cc, K, float("inf"),
            backend="tiled" if N > 16384 else "pallas").indices)(c)
        same = bool(jnp.all(got == exact))
        print(f"{name:9s} auto == exact indices: {same}", flush=True)
        assert same
