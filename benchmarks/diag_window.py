"""Diagnose the windowed tier-0 repair at 16k/65k on Gaussian clouds.

The round-5 route checks measured gaussian 65k selection at 26.4 ms —
WORSE than the pre-window two-tier repair's 22.7 (same-session uniform
anchor unchanged, so not drift). Hypothesis: the window tier's tier-up is
all-or-nothing — `jnp.all(nbad2 == 0)` — so ONE window-certificate failure
re-runs the whole r_small FULL-SCAN bucket on top of the window pass
(grid 14.3 + sort/prep + window 2.1 + full-scan 7.7 ~ 26, the measured
number). This harness counts, per cloud:
  - nbad: rows failing the grid certificate
  - window-certified: bad rows the window pass certifies (win_ok)
  - still_bad: rows that tier up (the cond trigger)
and slope-times the pieces: prep(sort+rank), window kernel, full-scan
bucket at r_small and at a hypothetical n/64 cascade bucket.

Run on the TPU: timeout 590 python benchmarks/diag_window.py [16k|65k]
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from egnn_tpu.ops.pallas.grid_knn import grid_knn_select_pallas
from egnn_tpu.ops.pallas.knn import (knn_select_queries_pallas,
                                     knn_select_window_pallas,
                                     supports_pallas_knn_window)
from egnn_tpu.utils.profiling import measure_op

ARM = sys.argv[1] if len(sys.argv) > 1 else "65k"
N = 65536 if ARM == "65k" else 16384
K = 16
B = 1

print(f"backend={jax.default_backend()} n={N} k={K} gaussian")
coors = jax.random.normal(jax.random.PRNGKey(3), (B, N, 3), jnp.float32)

# ---- grid pass: who fails the certificate? ----
gvals, gidx, gok, grow_exact = jax.jit(
    lambda c: grid_knn_select_pallas(c, K))(coors)
bad = ~np.asarray(grow_exact)
nbad = int(bad.sum())
print(f"grid gok={bool(gok)} nbad={nbad} ({100*nbad/N:.2f}%)")

r_small = min(N, max(128, N // 16))
r_tiny = min(N, max(128, N // 64))
W = min(-(-(N // 4) // 128) * 128, -(-N // 128) * 128)
print(f"r_small={r_small} r_tiny={r_tiny} W={W} "
      f"window_ok={supports_pallas_knn_window(N, W)}")

# ---- replicate the window tier prep (neighbors.py _window_tier) ----
badj = jnp.asarray(bad)


def prep(c32):
    xkey = c32[..., 0]
    order = jnp.argsort(xkey, axis=1).astype(jnp.int32)
    pts_s = jnp.take_along_axis(c32, order[..., None], axis=1)
    rank = jnp.zeros((B, N), jnp.int32)
    rank = jax.vmap(lambda rr, oo: rr.at[oo].set(
        jnp.arange(N, dtype=jnp.int32)))(rank, order)
    bigr = jnp.int32(2 * N)
    badkey = jnp.where(badj, rank, bigr + rank)
    _, fidx = jax.lax.top_k(-badkey, r_small)
    q = jnp.take_along_axis(c32, fidx[..., None], axis=1)
    qranks = jnp.take_along_axis(rank, fidx, axis=1)
    return q, qranks, pts_s, order, fidx


q, qranks, pts_s, order, fidx = jax.jit(prep)(coors)

rv, ri, rmargin = jax.jit(lambda *a: knn_select_window_pallas(*a, K, W))(
    q, qranks, pts_s, order)
win_ok = np.asarray(rv[:, :, K - 1] < rmargin * rmargin)
row_bad = np.asarray(jnp.take_along_axis(badj, fidx, axis=1))
certified = int((row_bad & win_ok).sum())
still = nbad - certified
print(f"window pass: bad-in-bucket={int(row_bad.sum())} "
      f"window-certified={certified} still_bad={still} "
      f"({100*still/max(nbad,1):.1f}% of bad rows tier up)")

# ---- slope timings of the pieces ----
def t(name, fn, *args):
    s = measure_op(jax.jit(fn), *args, reps_lo=20, reps_hi=100)
    print(f"{name:42s} {s*1e3:8.3f} ms", flush=True)
    return s


t("grid kernel pass", lambda c: grid_knn_select_pallas(c, K)[0].sum(), coors)
t("window-tier prep (sort+rank+gathers)",
  lambda c: sum(jnp.sum(x) for x in prep(c)[:2]), coors)
t("window kernel (R=r_small)",
  lambda c: knn_select_window_pallas(
      prep(c)[0], qranks, pts_s, order, K, W)[0].sum(), coors)
t("full-scan bucket R=r_small",
  lambda c: knn_select_queries_pallas(q, c, K)[0].sum(), coors)
qt = q[:, :r_tiny]
t("full-scan bucket R=r_tiny (n/64 cascade)",
  lambda c: knn_select_queries_pallas(qt, c, K)[0].sum(), coors)
