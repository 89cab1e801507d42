"""Dense flagship-shape micro A/Bs (n=1024, k=8, d=32, h=130, bf16 —
the bench.py winner arm's pipeline), one session:

  i_node   per-node proj_i + (b,n,k,h) broadcast add   (current dense form)
  i_edge   per-edge matmul on broadcast (b,n,k,d) rows (sparse-measured win)
  jd_sep   separate feats_j@w_j + dist@w_d matmuls      (current form)
  jd_cat   one concat [feats_j|dist] @ [w_j;w_d] matmul

Run: timeout 590 python benchmarks/ab_dense_i.py
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from egnn_tpu.utils.profiling import measure_op

B, N, K, D, H = 1, 1024, 8, 32, 130
bf = jnp.bfloat16
key = jax.random.PRNGKey(0)
w_i = jax.random.normal(key, (D, H), jnp.float32) * 0.02
w_j = jax.random.normal(jax.random.PRNGKey(1), (D, H), jnp.float32) * 0.02
w_d = jax.random.normal(jax.random.PRNGKey(2), (1, H), jnp.float32) * 0.02
rest = jax.random.normal(jax.random.PRNGKey(3), (B, N, K, H), jnp.float32)
feats_j = jax.random.normal(jax.random.PRNGKey(4), (B, N, K, D), jnp.float32)
dist = jax.random.normal(jax.random.PRNGKey(5), (B, N, K, 1), jnp.float32)
feats = jax.random.normal(jax.random.PRNGKey(6), (B, N, D), jnp.float32)

print(f"backend: {jax.default_backend()}", flush=True)


def meas(name, loss):
    def fb(v):
        l, g = jax.value_and_grad(loss)(v)
        return g.sum() * 1e-6 + l
    s = measure_op(jax.jit(fb), feats, reps_lo=300, reps_hi=1500, reps_outer=5)
    print(f"{name:10s} {s*1e6:8.1f} us", flush=True)


def i_node(f):
    p = f.astype(bf) @ w_i.astype(bf)
    h1 = p[:, :, None, :] + rest.astype(bf)
    return (jax.nn.silu(h1).astype(jnp.float32) ** 2).mean()


def i_edge(f):
    fb_ = jnp.broadcast_to(f[:, :, None, :], (B, N, K, D))
    h1 = fb_.astype(bf) @ w_i.astype(bf) + rest.astype(bf)
    return (jax.nn.silu(h1).astype(jnp.float32) ** 2).mean()


def jd_sep(f):
    p = (f.astype(bf) @ w_i.astype(bf))[:, :, None, :]
    h1 = p + feats_j.astype(bf) @ w_j.astype(bf) \
        + dist.astype(bf) @ w_d.astype(bf)
    return (jax.nn.silu(h1).astype(jnp.float32) ** 2).mean()


wjd = jnp.concatenate([w_j, w_d], axis=0)
fjd = jnp.concatenate([feats_j, dist], axis=-1)


def jd_cat(f):
    p = (f.astype(bf) @ w_i.astype(bf))[:, :, None, :]
    h1 = p + fjd.astype(bf) @ wjd.astype(bf)
    return (jax.nn.silu(h1).astype(jnp.float32) ** 2).mean()


import sys as _s
_sel = set(_s.argv[1:])
for nm, fn in (("i_node", i_node), ("i_edge", i_edge), ("jd_sep", jd_sep), ("jd_cat", jd_cat)):
    if not _sel or nm in _sel:
        meas(nm, fn)
