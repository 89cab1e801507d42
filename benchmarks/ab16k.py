import sys
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import functools
import jax, jax.numpy as jnp
from egnn_tpu import EGNNNetwork
from egnn_tpu.ops import neighbors as nb
from egnn_tpu.utils.profiling import measure_op

N, K, DIM, B = 16384, 16, 32, 1
coors = jax.random.normal(jax.random.PRNGKey(0), (B, N, 3), jnp.float32) * 10.0
feats = jax.random.normal(jax.random.PRNGKey(1), (B, N, DIM), jnp.float32)
net = EGNNNetwork(depth=3, dim=DIM,
                  layer_kwargs=dict(num_nearest_neighbors=K, norm_coors=True,
                                    coor_weights_clamp_value=2.0))
p = net.init(jax.random.PRNGKey(3), feats, coors)

def make_fb():
    def loss(pp, f_in, c):
        f, co = net.apply(pp, f_in, c)
        return (f**2).mean() + (co**2).mean()
    g = jax.jit(jax.grad(loss, argnums=(2,)))
    def fb(c):
        (gc,) = g(p, feats, c)
        return gc.sum() * 1e-6
    return jax.jit(fb)

orig = nb.knn_select_gather

fb_auto = make_fb()

@functools.wraps(orig)
def forced(*a, **kw):
    kw["backend"] = "pallas"
    return orig(*a, **kw)

results = {}
for name, patch in [("packed", None), ("exact", forced), ("packed2", None)]:
    nb.knn_select_gather = patch or orig
    # re-jit each time (different trace)
    def loss(pp, f_in, c):
        f, co = net.apply(pp, f_in, c)
        return (f**2).mean() + (co**2).mean()
    g = jax.jit(jax.grad(loss, argnums=(2,)))
    def fb(c):
        (gc,) = g(p, feats, c)
        return gc.sum() * 1e-6
    s = measure_op(jax.jit(fb), coors, reps_lo=5, reps_hi=20, reps_outer=2)
    print(f"{name:8s}: {s*1e3:7.2f} ms -> {B*N*K*3/s/1e6:5.1f} M edges/s", flush=True)
nb.knn_select_gather = orig
