"""A/B the full-band kNN kernel's row-band height (ti) at flagship sizes.

At n=1024/k=8 the kernel measures ~50 us against a ~13 us VPU-op model —
the gap is per-program fixed cost (2 programs at ti=512). This harness
monkeypatches _pick_ti and clears the jit cache to measure ti in
{256, 512, 1024} (1024 = ONE grid program; band+iota+evict ~12.5 MB VMEM,
slightly over the dispatcher's 12 MB budget — may fail to compile, which
this harness reports rather than crashes).

Run on the TPU: timeout 590 python benchmarks/ab_ti.py
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from egnn_tpu.ops.pallas import knn as K
from egnn_tpu.utils.profiling import measure_op

N, KNN, B = 1024, 8, 1


def arm(ti):
    orig = K._pick_ti
    K._pick_ti = lambda n, _ti=ti: _ti if n % _ti == 0 else orig(n)
    try:
        K._knn_call.clear_cache()
        coors = jax.random.normal(jax.random.PRNGKey(0), (B, N, 3), jnp.float32)

        def sel(c):
            v, i = K.knn_select_pallas(c, KNN)
            return v.sum() + i.sum()

        t = measure_op(lambda c: sel(c), coors, reps_lo=200, reps_hi=800)
        print(f"ti={ti}: {t*1e6:.1f} us")
        return t
    except Exception as e:  # compile failure at the VMEM edge
        print(f"ti={ti}: FAILED ({type(e).__name__}: {str(e)[:120]})")
        return None
    finally:
        K._pick_ti = orig
        K._knn_call.clear_cache()


if __name__ == "__main__":
    print(f"backend: {jax.default_backend()}")
    for ti in (256, 512, 1024):
        arm(ti)
