"""Round-4 continuation: within-ONE-session cost attribution of the bf16
WINNER arm of the flagship driver config (bench.py: n=1024, k=8, dim=32,
depth 3, mask + adj + clamp + norm_coors, compute_dtype=bf16).

Components measured with the slope discipline (measure_op), all in one
tunnel session so the numbers are comparable:

  sel3        3x kNN selection (what the 3 layers pay, stop-grad)
  selg3       3x selection + combined payload gather
  fwd         network forward
  fb_coor     fwd + bwd wrt coords
  fb_param    fwd + bwd wrt params
  step        full train step (fwd + bwd params&coords + fused Adam)

Deltas printed at the end attribute: XLA pipeline fwd, backward cost,
param-grad extra, optimizer+step overhead.

Run: timeout 590 python benchmarks/breakdown_r4c.py [component ...]
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
from egnn_tpu.training import TrainState, make_fused_adam, make_denoise_train_step
from egnn_tpu.training.data import synthetic_chain_batch
from egnn_tpu.utils.profiling import measure_op

N, K, DIM, DEPTH = 1024, 8, 32, 3

key = jax.random.PRNGKey(0)
b = synthetic_chain_batch(key, 1, N)
coors = b.noised_coors
adj = b.adj_mat
adj_b = b.adj_mat[None]

results = {}


def meas(name, fn, x, lo=200, hi=800):
    s = measure_op(jax.jit(fn), x, reps_lo=lo, reps_hi=hi, reps_outer=3)
    results[name] = s * 1e6
    print(f"{name:28s} {s*1e6:9.1f} us", flush=True)
    return s


sel = set(sys.argv[1:])
want = lambda n_: not sel or n_ in sel
print(f"backend: {jax.default_backend()}", flush=True)

net = EGNNNetwork(
    depth=DEPTH, dim=DIM, num_tokens=21, num_positions=N,
    layer_kwargs=dict(num_nearest_neighbors=K, norm_coors=True,
                      coor_weights_clamp_value=2.0,
                      compute_dtype=jnp.bfloat16),
)
params = jax.jit(net.init)(key, b.tokens, coors, adj_mat=adj, mask=b.mask)["params"]

if want("sel3"):
    def sel3(c):
        s = jnp.zeros((), jnp.float32)
        for i in range(DEPTH):
            nbhd = nb.knn_select(c * (1.0 + 1e-6 * i), K, float("inf"),
                                 mask=b.mask, adj_mat=adj_b)
            s = s + nbhd.ranking.sum() * 1e-9
        return s
    meas("sel3", sel3, coors)

if want("selg3"):
    feats = jax.random.normal(jax.random.PRNGKey(1), (1, N, DIM), jnp.float32)
    def selg3(c):
        s = jnp.zeros((), jnp.float32)
        for i in range(DEPTH):
            nbhd, g = nb.knn_select_gather(
                c * (1.0 + 1e-6 * i), K, float("inf"), mask=b.mask,
                adj_mat=adj_b, payload=feats, wide=True)
            s = s + g.sum() * 1e-9
        return s
    meas("selg3", selg3, coors)

if want("fwd"):
    def fwd(c):
        f, d = net.apply({"params": params}, b.tokens, c, adj_mat=adj, mask=b.mask)
        return f.sum() * 1e-9 + d.sum() * 1e-9
    meas("fwd", fwd, coors)

def loss_coor(c):
    f, d = net.apply({"params": params}, b.tokens, c, adj_mat=adj, mask=b.mask)
    return ((d - b.clean_coors) ** 2).mean()

if want("fb_coor"):
    def fb_coor(c):
        l, g = jax.value_and_grad(loss_coor)(c)
        return g.sum() * 1e-6 + l
    meas("fb_coor", fb_coor, coors)

if want("fb_param"):
    def loss_p(p, c):
        f, d = net.apply({"params": p}, b.tokens, c, adj_mat=adj, mask=b.mask)
        return ((d - b.clean_coors) ** 2).mean()
    def fb_param(c):
        l, gp = jax.value_and_grad(loss_p)(params, c)
        return sum(x.sum() for x in jax.tree_util.tree_leaves(gp)) * 1e-6 + l
    meas("fb_param", fb_param, coors)

if want("step"):
    state0 = TrainState.create(params, make_fused_adam(1e-3))
    step_fn = make_denoise_train_step(net)
    flat0, treedef = jax.tree_util.tree_flatten(state0)

    def step(c):
        # rebuild state from the perturbed input so chain iterations differ
        st = jax.tree_util.tree_unflatten(treedef, flat0)
        st, loss = step_fn(st, b.tokens, c, b.clean_coors, b.adj_mat, b.mask)
        return loss + st.params["layers_0"]["edge_mlp_0_w"].sum() * 1e-9
    meas("step", step, coors)

print("---- attribution (us) ----")
g = results.get
if g("sel3") and g("selg3"):
    print(f"gather (3 layers):        {g('selg3') - g('sel3'):9.1f}")
if g("selg3") and g("fwd"):
    print(f"XLA pipeline fwd (3 lay): {g('fwd') - g('selg3'):9.1f}")
if g("fwd") and g("fb_coor"):
    print(f"coor backward:            {g('fb_coor') - g('fwd'):9.1f}")
if g("fb_coor") and g("fb_param"):
    print(f"param-grad extra:         {g('fb_param') - g('fb_coor'):9.1f}")
if g("fb_param") and g("step"):
    print(f"step - fb_param:          {g('step') - g('fb_param'):9.1f}")
