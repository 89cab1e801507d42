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
STEPS_LO = int(os.environ.get("BENCH_STEPS_LO", "100"))
STEPS_HI = int(os.environ.get("BENCH_STEPS_HI", "900"))
EDGES_PER_STEP = BATCH * N * KNN * DEPTH


def _set_knn_ti(ti):
    """Override the full-band kNN kernel's row-band height process-wide
    (None = dispatcher default) via the kernel's supported tiling knob.
    Tiling only — selection results are bit-identical across ti."""
    from egnn_tpu.ops.pallas import knn as K

    K.set_band_height(ti)


def bench_tpu() -> float:
    import jax
    import jax.numpy as jnp

    # Persistent compile cache: arm probing compiles several scan programs;
    # make repeat runs (driver re-runs, queue runs) warm.
    jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from egnn_tpu import EGNNNetwork
    from egnn_tpu.training import TrainState, make_fused_adam, make_denoise_train_step
    from egnn_tpu.training.data import synthetic_chain_batch

    key = jax.random.PRNGKey(0)
    b = synthetic_chain_batch(key, BATCH, N)

    def build(layer_extra):
        net = EGNNNetwork(
            depth=DEPTH, dim=DIM, num_tokens=21, num_positions=N,
            layer_kwargs=dict(
                num_nearest_neighbors=KNN, norm_coors=True,
                coor_weights_clamp_value=2.0, **layer_extra,
            ),
        )
        params = jax.jit(net.init)(
            key, b.tokens, b.noised_coors, adj_mat=b.adj_mat, mask=b.mask
        )["params"]
        # Fused flat-buffer Adam: identical math to optax.adam (trajectory-
        # pinned in tests), ~8 fused ops over one buffer instead of ~8 x
        # num_leaves launch-bound tiny kernels.
        state = TrainState.create(params, make_fused_adam(1e-3))
        step_fn = make_denoise_train_step(net)

        # All timed steps run inside ONE jitted lax.scan per length so
        # remote-dispatch latency appears once per call; the slope between
        # the two lengths then cancels it exactly (the same discipline as
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
            # tunnels, block_until_ready can return before execution
            # completes, and identical inputs may be replay-cached — the
            # evolving state keeps inputs distinct, the fetch forces
            # execution.
            t0 = time.perf_counter()
            state, loss = run_scan(state, length)
            loss = float(loss)
            dt = time.perf_counter() - t0
            assert jnp.isfinite(loss), f"non-finite loss {loss}"
            return state, dt

        return run_scan, timed, state

    def forward_outputs(layer_extra, ti):
        """One jitted network forward under the arm's config (numpy out).
        Param trees are identical across arms (the flags add no params),
        so outputs are comparable against the default arm's."""
        import numpy as np
        _set_knn_ti(ti)
        try:
            net = EGNNNetwork(
                depth=DEPTH, dim=DIM, num_tokens=21, num_positions=N,
                layer_kwargs=dict(
                    num_nearest_neighbors=KNN, norm_coors=True,
                    coor_weights_clamp_value=2.0, **layer_extra,
                ),
            )
            variables = {"params": jax.jit(net.init)(
                key, b.tokens, b.noised_coors, adj_mat=b.adj_mat, mask=b.mask
            )["params"]}
            f, c = jax.jit(net.apply)(
                variables, b.tokens, b.noised_coors, adj_mat=b.adj_mat,
                mask=b.mask)
            return np.asarray(f), np.asarray(c)
        finally:
            _set_knn_ti(None)

    def arm_sane(layer_extra, ti, ref_fc):
        """On-chip correctness gate before an arm may win the probe:
        interpret-mode parity (tests/) cannot catch Mosaic LOWERING bugs,
        and the probe must never select a fast-but-wrong arm.
        (a) ti overrides: selection indices must be bit-identical to the
        default band height (pure tiling); (b) any arm: network forward
        must track the default arm's outputs (loose tol — bf16 MXU and op
        reordering move low bits, garbage/NaN/zero moves much more)."""
        import numpy as np
        if ti is not None and jax.default_backend() == "tpu":
            from egnn_tpu.ops.pallas.knn import knn_select_pallas
            cs = jax.random.normal(jax.random.PRNGKey(7), (BATCH, N, 3),
                                   jnp.float32)
            adj = jnp.abs(jnp.arange(N)[:, None] - jnp.arange(N)[None, :]) == 1
            adjb = jnp.broadcast_to(adj, (BATCH, N, N))
            mk = jnp.ones((BATCH, N), bool)
            _set_knn_ti(ti)
            try:
                v1, i1 = jax.jit(lambda c: knn_select_pallas(
                    c, KNN, mask=mk, adj_mat=adjb))(cs)
                i1 = np.asarray(i1)
            finally:
                _set_knn_ti(None)
            v0, i0 = jax.jit(lambda c: knn_select_pallas(
                c, KNN, mask=mk, adj_mat=adjb))(cs)
            if not np.array_equal(i1, np.asarray(i0)):
                return False
        f, c = forward_outputs(layer_extra, ti)
        fr, cr = ref_fc
        return (np.isfinite(f).all() and np.isfinite(c).all()
                and np.allclose(f, fr, rtol=0.1, atol=0.1)
                and np.allclose(c, cr, rtol=0.1, atol=0.1))

    def measure(layer_extra, ti, best_of):
        """Slope measurement for one arm; best-of-``best_of`` per length.
        Raises on compile failure (caller skips the arm) or on a
        non-positive slope after retries."""
        _set_knn_ti(ti)
        try:
            run_scan, timed, state = build(layer_extra)
            # warmup/compile both lengths
            state, _ = run_scan(state, STEPS_LO)
            state, _ = run_scan(state, STEPS_HI)
            # best-of-N per length, then slope of the bests: single-pair
            # slopes can go negative when tunnel jitter between two calls
            # exceeds the signal. A non-positive slope even on the bests
            # means the tunnel is too noisy for a valid measurement —
            # retry, then fail loudly rather than emit an absurd clamped
            # number into the BENCH record.
            for attempt in range(3):
                t_lo = t_hi = float("inf")
                for _ in range(best_of):
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
            return (t_hi - t_lo) / (STEPS_HI - STEPS_LO)
        finally:
            _set_knn_ti(None)

    # ---- arm probe: all arms are exact/parity-tested configurations of the
    # SAME network (fused_pairs: tests/test_pair_messages.py + tests_tpu;
    # ti: kernel tiling only). Autotune = probe each with a quick slope,
    # then run the full discipline on the winner. Non-default arms that
    # fail (e.g. ti=1024 sits at the VMEM edge) are skipped, never fatal.
    # Value-ordered (probe budget may cut the tail): bf16 messages measured
    # 1.93x on the streamed dense path and is parity-tested on the kNN path
    # (tests/test_mixed_precision.py) — probe it before the r3 arms that
    # measured as losses (fused_pairs 727 vs 681 us). Row-band ti arms are
    # gone: ab_ti (round 4) settled ti=128 as the dispatcher default.
    arms = [
        ("default", {}, None),
        ("bf16", dict(compute_dtype=jnp.bfloat16), None),
        ("bf16+fused_pairs", dict(compute_dtype=jnp.bfloat16, fused_pairs=True), None),
        ("fused_pairs", dict(fused_pairs=True), None),
    ]
    # Probe budget: on a cold .jax_cache the default arm's compiles alone
    # can eat it and the bf16 arms get skipped unprobed (round-5 session
    # log) — the queue pre-warms the cache, and BENCH_PROBE_BUDGET_S lets a
    # manual run extend it.
    probe_budget = float(os.environ.get("BENCH_PROBE_BUDGET_S", "480"))
    t_start = time.perf_counter()
    results = {}
    ref_fc = None
    for name, extra, ti in arms:
        if name != "default" and time.perf_counter() - t_start > probe_budget:
            print(f"arm {name}: skipped (probe time budget)", file=sys.stderr)
            continue
        try:
            if name == "default":
                ref_fc = forward_outputs(extra, ti)
            elif not arm_sane(extra, ti, ref_fc):
                print(f"arm {name}: skipped (failed on-chip sanity gate)",
                      file=sys.stderr)
                continue
            per_step = measure(extra, ti, best_of=2)
            results[name] = per_step
            print(f"arm {name}: {per_step*1e6:.1f} us/step", file=sys.stderr)
        except Exception as e:
            if name == "default":
                raise
            print(f"arm {name}: skipped ({type(e).__name__}: {str(e)[:200]})",
                  file=sys.stderr)

    winner = min(results, key=results.get)
    extra, ti = next((e, t) for n, e, t in arms if n == winner)
    print(f"winner: {winner}", file=sys.stderr)
    per_step = measure(extra, ti, best_of=3)
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
