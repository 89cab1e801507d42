"""North-star benchmark (BASELINE.md): edges/s/chip on a 1024-node kNN=8
EGNN forward+backward — anchor config 3 (EGNN_Network depth 3, dim 32,
1024 nodes, kNN 8, mask + clamp + norm_coors; README.md:50-68,156-174).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no benchmark numbers (BASELINE.md), so ``vs_baseline``
is the speedup over the torch reference implementation running the same
config on this machine's CPU (the only hardware the reference can use here).
That number is measured once and cached in BASELINE_LOCAL.json.
"""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
CACHE = REPO / "BASELINE_LOCAL.json"

# config 3
DEPTH, DIM, N, KNN, BATCH = 3, 32, 1024, 8, 1
# Two scan lengths; throughput from the SLOPE (t_hi - t_lo)/(hi - lo), which
# cancels the tunnel's fixed dispatch+fetch cost exactly. A single timed scan
# absorbs that fixed cost (30-100 ms depending on tunnel health) and swings
# the headline by +-20% between sessions.
STEPS_LO, STEPS_HI = 100, 900
EDGES_PER_STEP = BATCH * N * KNN * DEPTH


def bench_tpu() -> float:
    import jax
    import jax.numpy as jnp

    from egnn_tpu import EGNNNetwork
    from egnn_tpu.training import TrainState, make_fused_adam, make_denoise_train_step
    from egnn_tpu.training.data import synthetic_chain_batch

    net = EGNNNetwork(
        depth=DEPTH, dim=DIM, num_tokens=21, num_positions=N,
        layer_kwargs=dict(
            num_nearest_neighbors=KNN, norm_coors=True, coor_weights_clamp_value=2.0
        ),
    )
    key = jax.random.PRNGKey(0)
    b = synthetic_chain_batch(key, BATCH, N)
    params = jax.jit(net.init)(
        key, b.tokens, b.noised_coors, adj_mat=b.adj_mat, mask=b.mask
    )["params"]
    # Fused flat-buffer Adam: identical math to optax.adam (trajectory-
    # pinned in tests), ~8 fused ops over one buffer instead of ~8 x
    # num_leaves launch-bound tiny kernels.
    state = TrainState.create(params, make_fused_adam(1e-3))
    step_fn = make_denoise_train_step(net)

    # All timed steps run inside ONE jitted lax.scan per length so remote-
    # dispatch latency appears once per call; the slope between the two
    # lengths then cancels it exactly (the same discipline as
    # utils/profiling.py:measure_op).
    from functools import partial

    @partial(jax.jit, static_argnames=("length",))
    def run_scan(state, length):
        def body(st, _):
            st, loss = step_fn(
                st, b.tokens, b.noised_coors, b.clean_coors, b.adj_mat, b.mask
            )
            return st, loss
        state, losses = jax.lax.scan(body, state, None, length=length)
        return state, losses[-1]

    def timed(state, length):
        # Fetch the loss inside the timed region: through remote-TPU
        # tunnels, block_until_ready can return before execution completes,
        # and identical inputs may be replay-cached — the evolving state
        # keeps inputs distinct, the fetch forces execution.
        t0 = time.perf_counter()
        state, loss = run_scan(state, length)
        loss = float(loss)
        dt = time.perf_counter() - t0
        assert jnp.isfinite(loss), f"non-finite loss {loss}"
        return state, dt

    # warmup/compile both lengths
    state, _ = run_scan(state, STEPS_LO)
    state, _ = run_scan(state, STEPS_HI)
    # best-of-3 per length, then slope of the bests: single-pair slopes can
    # go negative when tunnel jitter between two calls exceeds the signal.
    # A non-positive slope even on the bests means the tunnel is too noisy
    # for a valid measurement — retry, then fail loudly rather than emit an
    # absurd clamped number into the BENCH record.
    for attempt in range(3):
        t_lo = t_hi = float("inf")
        for _ in range(3):
            state, t = timed(state, STEPS_LO)
            t_lo = min(t_lo, t)
            state, t = timed(state, STEPS_HI)
            t_hi = min(t_hi, t)
        if t_hi > t_lo:
            break
    else:
        raise RuntimeError(
            f"non-positive timing slope after 3 attempts "
            f"(t_lo={t_lo:.4f}s, t_hi={t_hi:.4f}s): tunnel too noisy"
        )
    per_step = (t_hi - t_lo) / (STEPS_HI - STEPS_LO)
    return EDGES_PER_STEP / per_step


def bench_torch_reference() -> float:
    """Measure the reference implementation (torch CPU — its only runnable
    hardware here) on the identical config; cached across rounds."""
    if CACHE.exists():
        data = json.loads(CACHE.read_text())
        if data.get("config") == [DEPTH, DIM, N, KNN, BATCH]:
            return data["edges_per_s"]

    sys.path.insert(0, "/root/reference")
    import torch
    from egnn_pytorch.egnn_pytorch import EGNN_Network as TorchNet

    torch.manual_seed(0)
    net = TorchNet(
        depth=DEPTH, dim=DIM, num_tokens=21, num_positions=N,
        num_nearest_neighbors=KNN, norm_coors=True, coor_weights_clamp_value=2.0,
    )
    opt = torch.optim.Adam(net.parameters(), lr=1e-3)
    tokens = torch.randint(0, 21, (BATCH, N))
    coors = torch.randn(BATCH, N, 3)
    target = torch.randn(BATCH, N, 3)
    mask = torch.ones(BATCH, N, dtype=torch.bool)
    ar = torch.arange(N)
    adj = (ar[:, None] - ar[None, :]).abs() == 1

    def step():
        opt.zero_grad()
        feats, out = net(tokens, coors, adj_mat=adj, mask=mask)
        loss = torch.nn.functional.mse_loss(out[mask], target[mask])
        loss.backward()
        opt.step()

    steps = 5
    step()  # warmup
    t0 = time.perf_counter()
    for _ in range(steps):
        step()
    dt = time.perf_counter() - t0
    eps = steps * EDGES_PER_STEP / dt
    CACHE.write_text(
        json.dumps({"config": [DEPTH, DIM, N, KNN, BATCH], "edges_per_s": eps,
                    "hardware": "torch CPU (reference's runnable hw here)"})
    )
    return eps


def main():
    edges_per_s = bench_tpu()
    try:
        baseline = bench_torch_reference()
        vs = edges_per_s / baseline
    except Exception as e:  # pragma: no cover
        print(f"baseline measurement failed: {e}", file=sys.stderr)
        vs = float("nan")
    print(json.dumps({
        "metric": "egnn_fwd_bwd_edges_per_s_per_chip",
        "value": round(edges_per_s, 1),
        "unit": "edges/s (1024-node kNN=8 depth=3 EGNN_Network fwd+bwd, TPU v5e chip)",
        "vs_baseline": round(vs, 2),
    }))


if __name__ == "__main__":
    main()
