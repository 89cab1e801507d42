"""Prototype: dynamic lane-axis slice of a VMEM-resident plane from a
per-program SMEM scalar — the key Mosaic capability the windowed repair
kernel (grid path, round 5) needs. Also times the windowed query kernel
shape vs the full-scan repair shape at 65k-class sizes.

Run on the TPU: timeout 590 python benchmarks/proto_window_slice.py
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

print("backend:", jax.default_backend())

N, W, TI, R, K, C = 65536, 16384, 32, 4096, 16, 3


def kernel(starts_ref, q_ref, pts_ref, ids_ref, out_v_ref, out_i_ref):
    ii = pl.program_id(0)
    # starts are in units of 128-lane tiles: Mosaic requires a STATIC proof
    # that a dynamic lane-axis slice start is a multiple of 128
    s = starts_ref[ii] * 128
    col_ids = ids_ref[0, pl.ds(s, W)].reshape(1, W)
    ranking = jnp.zeros((TI, W), jnp.float32)
    for cc in range(C):
        xi = q_ref[pl.ds(ii * TI, TI), cc].reshape(TI, 1)
        xj = pts_ref[cc, pl.ds(s, W)].reshape(1, W)
        d = xi - xj
        ranking = ranking + d * d
    vals, idxs = [], []
    big = jnp.int32(2**30)
    ids_b = jnp.broadcast_to(col_ids, (TI, W))
    for _ in range(K):
        m = jnp.min(ranking, axis=1, keepdims=True)
        pid = jnp.min(jnp.where(ranking == m, ids_b, big), axis=1,
                      keepdims=True)
        vals.append(m)
        idxs.append(pid)
        ranking = jnp.where((ranking == m) & (ids_b == pid), 3.4e38, ranking)
    out_v_ref[...] = jnp.concatenate(vals, axis=1)
    out_i_ref[...] = jnp.concatenate(idxs, axis=1)


@jax.jit
def run(starts, q, pts_t, ids):
    return pl.pallas_call(
        kernel,
        grid=(R // TI,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((R, C), lambda ii: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, N), lambda ii: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N), lambda ii: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TI, K), lambda ii: (ii, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TI, K), lambda ii: (ii, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((R, K), jnp.float32),
            jax.ShapeDtypeStruct((R, K), jnp.int32),
        ],
    )(starts, q, pts_t, ids)


key = jax.random.PRNGKey(0)
pts = jax.random.normal(key, (N, C), jnp.float32)
xr = jnp.argsort(pts[:, 0])
pts_sorted = pts[xr]
q_rows = jnp.sort(jax.random.permutation(jax.random.PRNGKey(1), N)[:R])
q = pts_sorted[q_rows]
starts = (jnp.clip(((q_rows[::TI] - W // 2) // 128) * 128, 0, N - W)
          // 128).astype(jnp.int32)
ids = xr.astype(jnp.int32)[None, :]

v, i = run(starts, q, jnp.swapaxes(pts_sorted, 0, 1), ids)
v, i = np.asarray(v), np.asarray(i)
print("compiled + ran; vals[0,:4] =", v[0, :4], "idx[0,:4] =", i[0, :4])

# correctness vs host reference on a few rows
ref_pts = np.asarray(pts)
for r in [0, 1, R // 2, R - 1]:
    qq = np.asarray(q[r])
    s = int(starts[r // TI]) * 128
    wnd = np.asarray(pts_sorted[s:s + W])
    wnd_ids = np.asarray(xr[s:s + W])
    d = ((wnd - qq) ** 2).sum(-1)
    ordr = np.lexsort((wnd_ids, d))[:K]
    np.testing.assert_allclose(v[r], d[ordr], rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(i[r], wnd_ids[ordr])
print("window selection matches host reference (lex tie order)")

# timing vs the full-scan repair kernel
import time
from egnn_tpu.ops.pallas.knn import knn_select_queries_pallas
from egnn_tpu.utils.profiling import measure_op

t = measure_op(
    lambda qq: run(starts, qq, jnp.swapaxes(pts_sorted, 0, 1), ids)[0].sum(),
    q, reps_lo=20, reps_hi=100)
print(f"windowed kernel (R={R}, W={W}, k={K}): {t*1e3:.3f} ms")
t2 = measure_op(
    lambda qq: knn_select_queries_pallas(qq[None], pts[None], K)[0].sum(),
    q, reps_lo=5, reps_hi=25)
print(f"full-scan queries kernel (R={R}, n={N}, k={K}): {t2*1e3:.3f} ms")
