import sys
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import functools, time
import jax, jax.numpy as jnp
from egnn_tpu import EGNN
from egnn_tpu.ops import neighbors as nb
from egnn_tpu.utils.profiling import measure_op

N, K, DIM, B = 16384, 16, 32, 1
coors = jax.random.normal(jax.random.PRNGKey(0), (B, N, 3), jnp.float32) * 10.0
feats = jax.random.normal(jax.random.PRNGKey(1), (B, N, DIM), jnp.float32)
layer = EGNN(dim=DIM, num_nearest_neighbors=K)
p = layer.init(jax.random.PRNGKey(2), feats, coors)

orig = nb.knn_select_gather
@functools.wraps(orig)
def forced(*a, **kw):
    kw["backend"] = "pallas"; return orig(*a, **kw)

def m(name, fn, x):
    t0=time.time()
    s = measure_op(fn, x, reps_lo=5, reps_hi=25, reps_outer=2)
    print(f"{name:40s} {s*1e3:8.3f} ms   (wall {time.time()-t0:.0f}s)", flush=True)

for name, patch in [("packed", orig), ("exact", forced)]:
    nb.knn_select_gather = patch
    def loss(c):
        f, co = layer.apply(p, feats, c)
        return (f**2).mean() + (co**2).mean()
    m(f"layer fwd+bwd [{name}]", jax.jit(jax.grad(loss)), coors)
nb.knn_select_gather = orig
