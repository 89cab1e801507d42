"""65k-node depth-3 network fwd+bwd on uniform AND gaussian clouds (the
realistic-data record row). Run: timeout 1200 python benchmarks/net65k.py"""
import sys
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from egnn_tpu import EGNNNetwork
from egnn_tpu.utils.profiling import measure_op

N, K, DIM, B = 65536, 16, 32, 1
feats = jax.random.normal(jax.random.PRNGKey(1), (B, N, DIM), jnp.float32)
# arms: f32 default + bf16 messages (the bench.py headline winner; parity-
# tested in tests/test_mixed_precision.py) — at 65k the non-selection XLA
# pipeline is ~2/3 of the step, exactly what compute_dtype halves.
for arm, extra in (("", {}), ("/bf16", dict(compute_dtype=jnp.bfloat16))):
    net = EGNNNetwork(depth=3, dim=DIM,
                      layer_kwargs=dict(num_nearest_neighbors=K,
                                        norm_coors=True,
                                        coor_weights_clamp_value=2.0,
                                        **extra))
    for name, coors in (
        ("uniform", jax.random.uniform(jax.random.PRNGKey(0), (B, N, 3),
                                       jnp.float32) * 40.0),
        ("gaussian", jax.random.normal(jax.random.PRNGKey(0), (B, N, 3),
                                       jnp.float32) * 10.0),
    ):
        p = net.init(jax.random.PRNGKey(3), feats, coors)
        def loss(c):
            f, co = net.apply(p, feats, c)
            return (f ** 2).mean() + (co ** 2).mean()
        def fb(c):
            l, g = jax.value_and_grad(loss)(c)
            return g.sum() * 1e-6 + l
        s = measure_op(jax.jit(fb), coors, reps_lo=4, reps_hi=16,
                       reps_outer=3)
        print(f"net65k {name}{arm}: {s*1e3:.1f} ms -> "
              f"{B*N*K*3/s/1e6:.1f} M edges/s", flush=True)
