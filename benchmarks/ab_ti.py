"""A/B the full-band kNN kernel's row-band height (ti) at flagship sizes.

At n=1024/k=8 the kernel measures ~50 us against a ~13 us VPU-op model.
Round-4 on-chip result: the gap is the BAND HEIGHT itself, not per-program
fixed cost — ti=256 (4 programs) runs 13.9 us vs ti=512 (2 programs)
49.8 us and ti=1024 (1 program) 53.9 us. This harness uses the kernel's
supported band_height knob to measure ti in {128, 256, 512, 1024},
both bare and under the flagship's mask+adjacency bands, checking index
equality against the dispatcher default before reporting a time (tiling
must not change selection).

Run on the TPU: timeout 590 python benchmarks/ab_ti.py
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from egnn_tpu.ops.pallas import knn as K
from egnn_tpu.utils.profiling import measure_op

N, KNN, B = 1024, 8, 1


def _args(with_adj):
    coors = jax.random.normal(jax.random.PRNGKey(0), (B, N, 3), jnp.float32)
    if not with_adj:
        return (coors,), {}
    ar = jnp.arange(N)
    adj = jnp.broadcast_to(jnp.abs(ar[:, None] - ar[None, :]) == 1, (B, N, N))
    return (coors,), dict(mask=jnp.ones((B, N), bool), adj_mat=adj)


def arm(ti, with_adj, ref_idx):
    label = f"ti={ti or 'default'}{' +mask+adj' if with_adj else ''}"
    try:
        (coors,), kw = _args(with_adj)

        _, idx = jax.jit(lambda c: K.knn_select_pallas(
            c, KNN, band_height=ti, **kw))(coors)
        idx = np.asarray(idx)
        if ref_idx is not None and not np.array_equal(idx, ref_idx):
            print(f"{label}: INDEX MISMATCH vs default — not a pure tiling")
            return None, idx

        def sel(c):
            v, i = K.knn_select_pallas(c, KNN, band_height=ti, **kw)
            return v.sum() + i.sum()

        t = measure_op(lambda c: sel(c), coors, reps_lo=200, reps_hi=800)
        print(f"{label}: {t*1e6:.1f} us")
        return t, idx
    except Exception as e:  # compile failure at the VMEM edge
        print(f"{label}: FAILED ({type(e).__name__}: {str(e)[:120]})")
        return None, None


if __name__ == "__main__":
    print(f"backend: {jax.default_backend()}")
    for with_adj in (False, True):
        _, ref_idx = arm(None, with_adj, None)
        for ti in (128, 256, 512, 1024):
            arm(ti, with_adj, ref_idx)
