"""TP crossover harness (VERDICT r4 item 6).

Tensor parallelism (parallel/tp.py) splits each MLP pair column/row over a
``model`` axis; the saving is (1 - 1/model) of the MLP matmul time, the
cost is one all-reduce of the OUTPUT activations per MLP pair. This
environment has ONE physical chip, so the collective cannot be measured —
this harness measures the two sides that CAN be:

1. the real per-layer MLP matmul time at the reference's own flagship
   width (README.md:17-29 — dim=512) across pair counts, full-width vs
   1/model-width weights (the compute TP-model would save), on hardware;
2. the modeled all-reduce cost (latency + bytes/ICI-BW) for the output
   activations — parameters stated inline, swap in measured values when a
   multi-chip slice exists;
3. when jax.device_count() > 1 on TPU, the REAL TP A/B: replicated vs
   tp_param_sharding'd layer step on a (1, model) mesh.

Prints the measured crossover table for docs/SCALING.md.

Run on the TPU: timeout 590 python benchmarks/ab_tp.py
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from egnn_tpu.utils.profiling import measure_op

# all-reduce cost model (v5e, STATED ASSUMPTIONS — single-chip environment):
# ~10 us launch/latency class per all-reduce, ICI ring bandwidth ~90 GB/s
# effective per direction for small rings. Replace with measured values on
# a real slice.
AR_LAT_S = 10e-6
ICI_BW = 90e9

DIM = 512          # the reference README's flagship layer width
M_DIM = 16
HID = 2 * (2 * DIM + 1)   # edge-MLP hidden (F=e=0)


def mlp_time(pairs, hidden, m_dim, reps=(30, 120)):
    """fwd+bwd time of the edge-MLP pair (pairs x hidden x m_dim) — the
    matmul block TP splits."""
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (pairs, 2 * DIM + 1), jnp.float32)
    w1 = jax.random.normal(jax.random.PRNGKey(1), (2 * DIM + 1, hidden),
                           jnp.float32) * 0.02
    w2 = jax.random.normal(jax.random.PRNGKey(2), (hidden, m_dim),
                           jnp.float32) * 0.02

    def loss(xx):
        h = jax.nn.silu(xx @ w1)
        return (jax.nn.silu(h @ w2) ** 2).mean()

    return measure_op(lambda xx: jax.value_and_grad(loss)(xx), x,
                      reps_lo=reps[0], reps_hi=reps[1])


def main():
    print(f"backend: {jax.default_backend()} devices: {len(jax.devices())}")
    print(f"edge-MLP at dim={DIM}: hidden={HID}, m_dim={M_DIM}")
    print(f"AR model: {AR_LAT_S*1e6:.0f} us latency + bytes/{ICI_BW/1e9:.0f} GB/s")
    rows = []
    # cap at 262144 pairs: the (pairs, 2050) f32 hidden activation is
    # 2.1 GB there and 8.4 GB at 1M — fwd+bwd at 1M RESOURCE_EXHAUSTs the
    # 16 GB chip (measured round 5); the crossover is monotone in pairs so
    # the table's conclusion is unchanged.
    for pairs in (4096, 16384, 65536, 262144):
        t_full = mlp_time(pairs, HID, M_DIM)
        out = []
        for model in (2, 4):
            hid_s = (HID + 2 * model - 1) // (2 * model) * 2  # per-shard cols
            t_shard = mlp_time(pairs, hid_s * 1, M_DIM)  # 1/model of hidden
            # per-MLP-pair all-reduce: output activations (pairs, m_dim) f32
            ar = AR_LAT_S + pairs * M_DIM * 4 * 2 * (model - 1) / model / ICI_BW
            tp_total = t_shard + ar
            win = tp_total < t_full
            out.append((model, t_shard, ar, tp_total, win))
        rows.append((pairs, t_full, out))
        s = " | ".join(
            f"TP{m}: shard {ts*1e6:.0f}us + AR {ar*1e6:.0f}us = "
            f"{tt*1e6:.0f}us {'WIN' if w else 'lose'}"
            for m, ts, ar, tt, w in out)
        print(f"pairs={pairs:>8}: full {t_full*1e6:8.1f} us | {s}", flush=True)

    # real multi-chip A/B when a slice exists
    if jax.default_backend() == "tpu" and len(jax.devices()) >= 2:
        from egnn_tpu import EGNN
        from egnn_tpu.parallel.tp import make_tp_mesh, tp_param_sharding

        model = 2 if len(jax.devices()) % 2 == 0 else 1
        if model > 1:
            n = 1024
            layer = EGNN(dim=DIM, tp_hidden_multiple=2 * model)
            key = jax.random.PRNGKey(0)
            feats = jax.random.normal(key, (1, n, DIM))
            coors = jax.random.normal(jax.random.PRNGKey(1), (1, n, 3))
            params = jax.jit(layer.init)(key, feats, coors)
            mesh = make_tp_mesh(data=1, model=model)
            p_tp = jax.device_put(params, tp_param_sharding(params, mesh))

            def loss(p, f):
                fo, co = layer.apply(p, f, coors)
                return (fo ** 2).mean() + (co ** 2).mean()

            for name, p in (("replicated", params), ("tp", p_tp)):
                t = measure_op(
                    lambda f, p=p: jax.grad(loss, argnums=1)(p, f), feats,
                    reps_lo=20, reps_hi=80)
                print(f"REAL {name} layer fwd+bwd (dim={DIM}, n={n}, "
                      f"model={model}): {t*1e6:.1f} us")
    else:
        print("single chip: real TP A/B skipped (runs when a slice exists)")


if __name__ == "__main__":
    main()
