"""A/B the b=8 layer bwd regression: fused vs unfused gather at b=1/8.

brk_saturated measured the flagship layer bwd DEGRADING per-graph at b=8
(45.5 -> 76.9 us/graph) while fwd amortizes. Suspect: the fused gather's
backward (segment-sum scatter) or an XLA fusion change at b=8. This A/Bs
layer fwd+bwd with FUSED_GATHER_AUTO on/off at both batch sizes.

Run on the TPU: timeout 1200 python benchmarks/ab_b8_bwd.py
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from egnn_tpu import EGNN
from egnn_tpu.ops import neighbors as nb
from egnn_tpu.utils.profiling import measure_op

N, K, DIM = 1024, 8, 32
key = jax.random.PRNGKey(0)
print(f"backend: {jax.default_backend()}", flush=True)

for B in (1, 8):
    coors = jax.random.normal(key, (B, N, 3), jnp.float32)
    feats = jax.random.normal(jax.random.PRNGKey(1), (B, N, DIM),
                              jnp.float32)
    mask = jnp.ones((B, N), bool)
    ar = jnp.arange(N)
    adj = jnp.broadcast_to(jnp.abs(ar[:, None] - ar[None, :]) == 1,
                           (B, N, N))

    def make(fused):
        nb.FUSED_GATHER_AUTO = fused
        layer = EGNN(dim=DIM, num_nearest_neighbors=K, norm_coors=True,
                     coor_weights_clamp_value=2.0)
        p = layer.init(jax.random.PRNGKey(2), feats, coors, mask=mask,
                       adj_mat=adj)

        def fwd(c):
            f, co = layer.apply(p, feats, c, mask=mask, adj_mat=adj)
            return (co ** 2).mean()
        return fwd

    for name, fused in (("FUSED", True), ("UNFUSED", False)):
        fwd = make(fused)
        for arm, fn in (("fwd", lambda c: fwd(c)),
                        ("fwd+bwd", lambda c: jax.grad(fwd)(c).sum())):
            print(f"b={B} {name} {arm} compiling...", flush=True)
            s = measure_op(jax.jit(fn), coors, reps_lo=50, reps_hi=200)
            print(f"b={B} {name} {arm:8s} {s*1e6:9.1f} us "
                  f"({s*1e6/B:7.1f} us/graph)", flush=True)
    nb.FUSED_GATHER_AUTO = True
