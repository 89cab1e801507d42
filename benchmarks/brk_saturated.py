"""Why does b=8 of the flagship config run 23% SLOWER per-graph than b=1?
(bench_all round-5: anchor3 459.9 us at b=1 vs 4529/8 = 566 us/graph at
b=8.) Break the layer into stages at both batch sizes and compare
per-graph scaling: selection kernel, fused selection+gather, layer
fwd, layer fwd+bwd, plus the adjacency-band HBM hypothesis (the (b,n,n)
i8 band is the only input that scales superlinearly with what VMEM holds).

Run on the TPU: timeout 900 python benchmarks/brk_saturated.py
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from egnn_tpu import EGNN
from egnn_tpu.ops.pallas.knn import knn_select_gather_pallas, knn_select_pallas
from egnn_tpu.utils.profiling import measure_op

N, K, DIM = 1024, 8, 32
key = jax.random.PRNGKey(0)
print(f"backend: {jax.default_backend()}", flush=True)

for B in (1, 8):
    coors = jax.random.normal(key, (B, N, 3), jnp.float32)
    feats = jax.random.normal(jax.random.PRNGKey(1), (B, N, DIM), jnp.float32)
    mask = jnp.ones((B, N), bool)
    ar = jnp.arange(N)
    adj = jnp.broadcast_to(jnp.abs(ar[:, None] - ar[None, :]) == 1,
                           (B, N, N))
    table = jnp.concatenate(
        [coors, mask[..., None].astype(jnp.float32), feats], axis=-1)

    def m(name, fn, x, lo=100, hi=500):
        s = measure_op(jax.jit(fn), x, reps_lo=lo, reps_hi=hi)
        print(f"b={B} {name:40s} {s*1e6:9.1f} us  ({s*1e6/B:7.1f} us/graph)",
              flush=True)
        return s

    m("select only (mask+adj)",
      lambda c: knn_select_pallas(c, K, mask=mask, adj_mat=adj)[1].sum(),
      coors)
    m("select only (mask, NO adj)",
      lambda c: knn_select_pallas(c, K, mask=mask)[1].sum(), coors)
    m("fused select+gather (mask+adj)",
      lambda c: knn_select_gather_pallas(
          c, K, table, mask=mask, adj_mat=adj)[2].sum(), coors)

    layer = EGNN(dim=DIM, num_nearest_neighbors=K, norm_coors=True,
                 coor_weights_clamp_value=2.0)
    p = layer.init(jax.random.PRNGKey(2), feats, coors, mask=mask,
                   adj_mat=adj)

    def fwd(c):
        f, co = layer.apply(p, feats, c, mask=mask, adj_mat=adj)
        return (co ** 2).mean()

    m("layer fwd", fwd, coors)
    m("layer fwd+bwd", lambda c: jax.grad(fwd)(c).sum(), coors, lo=50,
      hi=250)
