"""Within-ONE-session A/B of the selection kernels' adjacency band dtype
(i8 vs i32). At n=1024 the full-band kernel is VPU-bound; at n >= 4096 the
(b, n, n) adjacency read dominates the band's HBM traffic (64 MB as i32 at
n=4096 vs 16 MB as i8).

Run: timeout 590 python benchmarks/ab_adj_dtype.py
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from egnn_tpu.ops import neighbors as nb
from egnn_tpu.ops.pallas import knn as K
from egnn_tpu.utils.profiling import measure_op

print(f"backend: {jax.default_backend()}", flush=True)

import numpy as np

for n, k, lo, hi in ((1024, 8, 200, 800), (4096, 16, 50, 200)):
    coors = jax.random.normal(jax.random.PRNGKey(0), (1, n, 3), jnp.float32)
    mask = jnp.ones((1, n), bool)
    adj = (jnp.abs(jnp.arange(n)[:, None] - jnp.arange(n)[None, :]) == 1)[None]
    idx = {}
    for dt, name in ((jnp.int32, "i32"), (jnp.int8, "i8")):
        K._ADJ_DTYPE = dt
        K._knn_call.clear_cache()

        def sel(c):
            nbhd = nb.knn_select(c, k, float("inf"), mask=mask, adj_mat=adj)
            return nbhd.ranking.sum() * 1e-9, nbhd.indices

        f = jax.jit(lambda c: sel(c)[0])
        s = measure_op(f, coors, reps_lo=lo, reps_hi=hi, reps_outer=3)
        idx[name] = np.asarray(jax.jit(lambda c: sel(c)[1])(coors))
        print(f"n={n:5d} adj={name:3s}  {s*1e6:8.1f} us", flush=True)
    assert np.array_equal(idx["i32"], idx["i8"]), "dtype changed selection!"
    print(f"n={n}: selections bit-identical", flush=True)
K._ADJ_DTYPE = jnp.int8
