"""A/B the fused selection+payload-gather kernel at the flagship config.

Default path: exact full-band selection kernel (~24 us at n=1024 k=8 under
mask+adjacency) + ONE combined [coors|mask|feats] XLA gather (~25 us/layer
fwd+bwd incl. the backward scatter). Fused path (backend="fused" /
FUSED_GATHER_AUTO): the kernel keeps the payload table in VMEM and extracts
winner rows with one-hot MXU matmuls under HIGHEST — no XLA gather, backward
is the same segment-sum scatter on the saved indices.

Measures, per arm:
  1. op-level: selection alone vs selection+gather (fused) vs
     selection + XLA combined gather (default decomposition)
  2. layer-level fwd+bwd (the decisive number, ab_layer discipline)
  3. network-level: flagship depth-3 fwd+bwd wrt coords

Correctness gate on-chip before timing: fused indices/payload must be
bit-identical to the default path's.

Run on the TPU: timeout 590 python benchmarks/ab_fused_gather.py
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
from egnn_tpu.ops.core import gather_nodes
from egnn_tpu.ops.pallas.knn import knn_select_gather_pallas, knn_select_pallas
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


print(f"backend: {jax.default_backend()}")

# ---- correctness gate: fused == default bitwise on-chip ----
v0, i0 = jax.jit(lambda c: knn_select_pallas(c, K, mask=mask, adj_mat=adj))(coors)
v1, i1, g1 = jax.jit(lambda c, t: knn_select_gather_pallas(
    c, K, t, mask=mask, adj_mat=adj))(coors, table)
g0 = jax.jit(lambda t, i: gather_nodes(t, i))(table, i0)
assert np.array_equal(np.asarray(i0), np.asarray(i1)), "fused index mismatch"
assert np.array_equal(np.asarray(v0), np.asarray(v1)), "fused vals mismatch"
if not np.array_equal(np.asarray(g0), np.asarray(g1)):
    d = np.abs(np.asarray(g0) - np.asarray(g1)).max()
    print(f"payload NOT bitwise (max |d| = {d:.3e}) — "
          f"{'acceptable' if d == 0 else 'INVESTIGATE'}")
assert np.allclose(np.asarray(g0), np.asarray(g1), atol=0), "payload mismatch"
print("correctness gate: fused == exact+gather (bitwise)")

# ---- 1. op level ----
m("select only (full-band)",
  jax.jit(lambda c: knn_select_pallas(c, K, mask=mask, adj_mat=adj)[1].sum()),
  coors)
m("select + XLA combined gather",
  jax.jit(lambda c: gather_nodes(
      table, knn_select_pallas(c, K, mask=mask, adj_mat=adj)[1]).sum()),
  coors)
m("fused select+gather kernel",
  jax.jit(lambda c: knn_select_gather_pallas(
      c, K, table, mask=mask, adj_mat=adj)[2].sum()),
  coors)

# ---- 2. layer level fwd+bwd ----
layer = EGNN(dim=DIM, num_nearest_neighbors=K, norm_coors=True,
             coor_weights_clamp_value=2.0)
p = layer.init(jax.random.PRNGKey(2), feats, coors, mask=mask, adj_mat=adj)

for name, flag in [("default", False), ("fused", True)]:
    nb.FUSED_GATHER_AUTO = flag

    def loss(c, f):
        fo, co = layer.apply(p, f, c, mask=mask, adj_mat=adj)
        return (fo ** 2).mean() + (co ** 2).mean()

    m(f"layer fwd+bwd [{name}]",
      jax.jit(lambda c: jax.grad(loss, argnums=(0, 1))(c, feats)[0].sum()),
      coors)
nb.FUSED_GATHER_AUTO = False

# ---- 3. network level (flagship anchor-3 coor grads) ----
net = EGNNNetwork(
    depth=3, dim=DIM, num_tokens=21, num_positions=N,
    layer_kwargs=dict(num_nearest_neighbors=K, norm_coors=True,
                      coor_weights_clamp_value=2.0),
)
tokens = jax.random.randint(jax.random.PRNGKey(3), (B, N), 0, 21)
np_ = jax.jit(net.init)(key, tokens, coors, adj_mat=adj, mask=mask)

for name, flag in [("default", False), ("fused", True)]:
    nb.FUSED_GATHER_AUTO = flag

    def nloss(c):
        f, co = net.apply(np_, tokens, c, adj_mat=adj, mask=mask)
        return (co ** 2).mean()

    m(f"net depth-3 fwd+bwd coords [{name}]",
      jax.jit(lambda c: jax.grad(nloss)(c).sum()), coors, lo=50, hi=250)
nb.FUSED_GATHER_AUTO = False

# ---- 4. extraction-precision arms: split3 vs highest (round-5 lever) ----
# split3 = three DEFAULT bf16-plane one-hot dots (3 MXU passes) instead of
# one HIGHEST dot (6 passes); results are bitwise identical (gated below +
# tests/test_pallas_knn.py::test_fused_gather_split3_bitwise). The fwd
# one-hot matmuls measured ~62 us (6-pass MXU roofline) — the model says
# split3 halves them. Decide at the LAYER level per the discipline.
from egnn_tpu.ops.pallas import knn as KN

print("\n-- extraction arms (fused kernel) --")
v_s, i_s, g_s = jax.jit(lambda c, t: knn_select_gather_pallas(
    c, K, t, mask=mask, adj_mat=adj, extract="split3"))(coors, table)
assert np.array_equal(np.asarray(i1), np.asarray(i_s)), "split3 idx mismatch"
assert np.array_equal(np.asarray(v1), np.asarray(v_s)), "split3 val mismatch"
if not np.array_equal(np.asarray(g1), np.asarray(g_s)):
    d = np.abs(np.asarray(g1) - np.asarray(g_s)).max()
    raise AssertionError(f"split3 payload NOT bitwise on-chip (max |d|={d:.3e})")
print("correctness gate: split3 == highest (bitwise, on-chip)")

for ex in ("highest", "split3"):
    m(f"fused select+gather kernel fwd [{ex}]",
      jax.jit(lambda c: knn_select_gather_pallas(
          c, K, table, mask=mask, adj_mat=adj, extract=ex)[2].sum()),
      coors)

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
