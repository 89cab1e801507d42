"""Split3 vs HIGHEST extraction for the fused kNN gather — lean arm set
(benchmarks/ab_fused_gather.py sections 1-3 are already measured; this
re-measures ONLY the extraction-precision decision at the flagship config,
with the bitwise gate first). Flip ops/pallas/knn.py:FUSED_EXTRACT on a
layer-level win per the measured discipline.

Run on the TPU: timeout 590 python benchmarks/ab_split3.py
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from egnn_tpu import EGNN, EGNNNetwork
from egnn_tpu.ops import neighbors as nb
from egnn_tpu.ops.pallas import knn as KN
from egnn_tpu.ops.pallas.knn import knn_select_gather_pallas
from egnn_tpu.utils.profiling import measure_op

N, K, DIM, B = 1024, 8, 32, 1

key = jax.random.PRNGKey(0)
coors = jax.random.normal(key, (B, N, 3), jnp.float32)
feats = jax.random.normal(jax.random.PRNGKey(1), (B, N, DIM), jnp.float32)
mask = jnp.ones((B, N), bool)
ar = jnp.arange(N)
adj = jnp.broadcast_to(jnp.abs(ar[:, None] - ar[None, :]) == 1, (B, N, N))
table = jnp.concatenate([coors, mask[..., None].astype(jnp.float32), feats],
                        axis=-1)


def m(name, fn, x, lo=100, hi=500):
    t0 = time.time()
    s = measure_op(fn, x, reps_lo=lo, reps_hi=hi)
    print(f"{name:44s} {s*1e6:9.1f} us   (wall {time.time()-t0:.0f}s)",
          flush=True)
    return s


print(f"backend: {jax.default_backend()}", flush=True)

# ---- bitwise gate ----
outs = {}
for ex in ("highest", "split3"):
    outs[ex] = jax.jit(lambda c, t: knn_select_gather_pallas(
        c, K, t, mask=mask, adj_mat=adj, extract=ex))(coors, table)
for a, b_ in zip(outs["highest"], outs["split3"]):
    assert np.array_equal(np.asarray(a), np.asarray(b_)), "split3 mismatch"
print("correctness gate: split3 == highest (bitwise, on-chip)", flush=True)

# ---- op-level fwd ----
for ex in ("highest", "split3"):
    m(f"fused kernel fwd [{ex}]",
      jax.jit(lambda c: knn_select_gather_pallas(
          c, K, table, mask=mask, adj_mat=adj, extract=ex)[2].sum()),
      coors)

# ---- layer + network fwd+bwd (the decisive level) ----
layer = EGNN(dim=DIM, num_nearest_neighbors=K, norm_coors=True,
             coor_weights_clamp_value=2.0)
p = layer.init(jax.random.PRNGKey(2), feats, coors, mask=mask, adj_mat=adj)
net = EGNNNetwork(
    depth=3, dim=DIM, num_tokens=21, num_positions=N,
    layer_kwargs=dict(num_nearest_neighbors=K, norm_coors=True,
                      coor_weights_clamp_value=2.0),
)
tokens = jax.random.randint(jax.random.PRNGKey(3), (B, N), 0, 21)
np_ = jax.jit(net.init)(key, tokens, coors, adj_mat=adj, mask=mask)

for ex in ("highest", "split3"):
    KN.FUSED_EXTRACT = ex
    nb.FUSED_GATHER_AUTO = True

    def loss2(c, f):
        fo, co = layer.apply(p, f, c, mask=mask, adj_mat=adj)
        return (fo ** 2).mean() + (co ** 2).mean()

    m(f"layer fwd+bwd [fused/{ex}]",
      jax.jit(lambda c: jax.grad(loss2, argnums=(0, 1))(c, feats)[0].sum()),
      coors)

    def nloss2(c):
        f, co = net.apply(np_, tokens, c, adj_mat=adj, mask=mask)
        return (co ** 2).mean()

    m(f"net depth-3 fwd+bwd coords [fused/{ex}]",
      jax.jit(lambda c: jax.grad(nloss2)(c).sum()), coors, lo=50, hi=250)
KN.FUSED_EXTRACT = "highest"
nb.FUSED_GATHER_AUTO = False
