"""Cost breakdown of the flagship driver config (n=1024, k=8, depth 3,
mask + adj + clamp + norm_coors — bench.py's exact workload), measured on
the real chip with slope timing. Identifies where each microsecond of the
~700 us full train step goes. Run: timeout 590 python benchmarks/breakdown_flagship.py
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from egnn_tpu import EGNNNetwork
from egnn_tpu.ops import neighbors as nb
from egnn_tpu.training.data import synthetic_chain_batch
from egnn_tpu.utils.profiling import measure_op

N, K, DIM, DEPTH = 1024, 8, 32, 3

key = jax.random.PRNGKey(0)
b = synthetic_chain_batch(key, 1, N)
coors = b.noised_coors


def meas(name, fn, x, lo=200, hi=800):
    s = measure_op(fn, x, reps_lo=lo, reps_hi=hi, reps_outer=3)
    print(f"{name:46s} {s*1e6:9.1f} us")
    return s


sel = set(sys.argv[1:])
want = lambda n_: not sel or n_ in sel
print(f"backend: {jax.default_backend()}")

# adjacency forces chain neighbors into the ranking like the network does
adj = b.adj_mat          # (n, n) — net.apply broadcasts internally
adj_b = b.adj_mat[None]  # (1, n, n) for direct kernel calls

if want("select"):
    def sel_fn(c):
        nbhd = nb.knn_select(c, K, float("inf"), mask=b.mask, adj_mat=adj_b)
        return nbhd.ranking.sum() * 1e-9
    meas("knn_select (mask+adj)", jax.jit(sel_fn), coors)

if want("select_gather"):
    feats = jax.random.normal(jax.random.PRNGKey(1), (1, N, DIM), jnp.float32)
    def sg_fn(c):
        nbhd, g = nb.knn_select_gather(
            c, K, float("inf"), mask=b.mask, adj_mat=adj_b, payload=feats)
        return g.sum() * 1e-9
    meas("knn_select_gather (+payload)", jax.jit(sg_fn), coors)

net = EGNNNetwork(
    depth=DEPTH, dim=DIM, num_tokens=21, num_positions=N,
    layer_kwargs=dict(num_nearest_neighbors=K, norm_coors=True,
                      coor_weights_clamp_value=2.0),
)
params = jax.jit(net.init)(key, b.tokens, coors, adj_mat=adj, mask=b.mask)["params"]

if want("net_fwd"):
    def net_fwd(c):
        f, d = net.apply({"params": params}, b.tokens, c, adj_mat=adj, mask=b.mask)
        return f.sum() * 1e-9 + d.sum() * 1e-9
    meas("network fwd", jax.jit(net_fwd), coors)

def loss_coor(c):
    f, d = net.apply({"params": params}, b.tokens, c, adj_mat=adj, mask=b.mask)
    return ((d - b.clean_coors) ** 2).mean()

if want("net_coor"):
    def net_fb(c):
        l, g = jax.value_and_grad(loss_coor)(c)
        return g.sum() * 1e-6 + l
    meas("network fwd+bwd (coor grads)", jax.jit(net_fb), coors)

if want("net_param"):
    def loss_p(p, c):
        f, d = net.apply({"params": p}, b.tokens, c, adj_mat=adj, mask=b.mask)
        return ((d - b.clean_coors) ** 2).mean()

    def net_fbp(c):
        l, gp = jax.value_and_grad(loss_p)(params, c)
        return sum(x.sum() for x in jax.tree_util.tree_leaves(gp)) * 1e-6 + l
    meas("network fwd+bwd (param grads)", jax.jit(net_fbp), coors)
