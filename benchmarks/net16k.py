import sys
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import time
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from egnn_tpu import EGNNNetwork
from egnn_tpu.utils.profiling import measure_op

N, K, DIM, B = 16384, 16, 32, 1
feats = jax.random.normal(jax.random.PRNGKey(1), (B, N, DIM), jnp.float32)
# arms: f32 default + bf16 messages (the bench.py headline winner; parity-
# tested in tests/test_mixed_precision.py); gaussian = the realistic cloud.
for arm, extra in (("", {}), ("/bf16", dict(compute_dtype=jnp.bfloat16))):
    net = EGNNNetwork(depth=3, dim=DIM,
                      layer_kwargs=dict(num_nearest_neighbors=K,
                                        norm_coors=True,
                                        coor_weights_clamp_value=2.0,
                                        **extra))
    coors = jax.random.normal(jax.random.PRNGKey(0), (B, N, 3),
                              jnp.float32) * 10.0
    p = net.init(jax.random.PRNGKey(3), feats, coors)
    def loss(pp, f_in, c):
        f, co = net.apply(pp, f_in, c)
        return (f**2).mean() + (co**2).mean()
    g = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
    def fb(c):
        gp, gf, gc = g(p, feats, c)
        return gc.sum() * 1e-6
    t0 = time.time()
    s = measure_op(jax.jit(fb), coors, reps_lo=5, reps_hi=20, reps_outer=2)
    print(f"network 16k fwd+bwd{arm}: {s*1e3:.2f} ms -> "
          f"{B*N*K*3/s/1e6:.1f} M edges/s  (wall {time.time()-t0:.0f}s)",
          flush=True)
