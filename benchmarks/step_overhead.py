"""Attribute the flagship train-step overhead (VERDICT r2 item 1).

bench.py measures the FULL train step (fwd+bwd+Adam, ~738 us r2) while the
anchor-3 fwd+bwd w.r.t. COORDS alone is ~440 us. This script decomposes the
gap within one TPU session, all slope-timed (two scan lengths, best-of-N):

  coor_grad   — value_and_grad wrt coords only (anchor-3 discipline)
  param_sgd   — value_and_grad wrt PARAMS + trivial p-=1e-30*g update
                (adds the param-grad backward matmuls + per-leaf touch)
  full_adam   — the bench.py step (param grads + optax Adam over the tree)
  adam_only   — optax Adam update alone on frozen grads (tree of ~40 leaves)
  fused_only  — flat-buffer Adam update alone (training.make_fused_adam,
                the optimizer bench.py's headline step uses)
  full_fused  — param grads + flat-buffer fused Adam (= the bench.py step)

Run on the TPU: python benchmarks/step_overhead.py
"""
from __future__ import annotations

import json
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from egnn_tpu import EGNNNetwork
from egnn_tpu.training import TrainState, make_adam, make_denoise_train_step
from egnn_tpu.training.data import synthetic_chain_batch

DEPTH, DIM, N, KNN, BATCH = 3, 32, 1024, 8, 1
LO, HI = 100, 500


def slope_time(run_scan, carry, reps=3):
    """Per-step seconds from the (LO, HI)-scan slope, best-of-``reps``.
    ``run_scan(carry, length) -> (carry, scalar)``; the scalar fetch is the
    execution barrier, the evolving carry keeps inputs distinct."""
    carry, _ = run_scan(carry, LO)
    carry, _ = run_scan(carry, HI)

    def timed(carry, length):
        t0 = time.perf_counter()
        carry, s = run_scan(carry, length)
        s = float(s)
        return carry, time.perf_counter() - t0, s

    t_lo = t_hi = float("inf")
    for _ in range(reps):
        carry, t, s = timed(carry, LO)
        assert jnp.isfinite(s), s
        t_lo = min(t_lo, t)
        carry, t, s = timed(carry, HI)
        t_hi = min(t_hi, t)
    assert t_hi > t_lo, (t_lo, t_hi)
    return (t_hi - t_lo) / (HI - LO)


def main():
    sel = set(sys.argv[1:])  # empty = all
    want = lambda name: not sel or name in sel
    print(f"backend: {jax.default_backend()}  device: {jax.devices()[0]}")
    key = jax.random.PRNGKey(0)
    b = synthetic_chain_batch(key, BATCH, N)
    net = EGNNNetwork(
        depth=DEPTH, dim=DIM, num_tokens=21, num_positions=N,
        layer_kwargs=dict(num_nearest_neighbors=KNN, norm_coors=True,
                          coor_weights_clamp_value=2.0),
    )
    params = jax.jit(net.init)(
        key, b.tokens, b.noised_coors, adj_mat=b.adj_mat, mask=b.mask
    )["params"]
    leaves = jax.tree_util.tree_leaves(params)
    print(f"params: {len(leaves)} leaves, "
          f"{sum(x.size for x in leaves)} total elements")

    def loss_of(params, coors):
        f, d = net.apply({"params": params}, b.tokens, coors,
                         adj_mat=b.adj_mat, mask=b.mask)
        return ((d - b.clean_coors) ** 2).mean()

    results = {}

    # ---- coor_grad: anchor-3 discipline (grads wrt coords only) ----
    @partial(jax.jit, static_argnames=("length",), donate_argnums=(0,))
    def scan_coor(coors, length):
        def body(co, _):
            l, g = jax.value_and_grad(lambda c: loss_of(params, c))(co)
            return co + 1e-12 * g, l
        co, ls = jax.lax.scan(body, coors, None, length=length)
        return co, ls[-1]

    if want("coor_grad"):
        results["coor_grad_us"] = slope_time(scan_coor, jnp.copy(b.noised_coors)) * 1e6

    # ---- param_sgd: param grads + trivial per-leaf update ----
    @partial(jax.jit, static_argnames=("length",), donate_argnums=(0,))
    def scan_param(params, length):
        def body(p, _):
            l, g = jax.value_and_grad(
                lambda pp: loss_of(pp, b.noised_coors))(p)
            p = jax.tree.map(lambda x, gg: x - 1e-30 * gg, p, g)
            return p, l
        p, ls = jax.lax.scan(body, params, None, length=length)
        return p, ls[-1]

    if want("param_sgd"):
        results["param_sgd_us"] = slope_time(
            scan_param, jax.tree.map(jnp.copy, params)) * 1e6

    # ---- full_adam: the bench.py step ----
    tx = make_adam(1e-3)
    state = TrainState.create(jax.tree.map(jnp.copy, params), tx)
    step_fn = make_denoise_train_step(net)

    @partial(jax.jit, static_argnames=("length",), donate_argnums=(0,))
    def scan_full(state, length):
        def body(st, _):
            st, l = step_fn(st, b.tokens, b.noised_coors, b.clean_coors,
                            b.adj_mat, b.mask)
            return st, l
        st, ls = jax.lax.scan(body, state, None, length=length)
        return st, ls[-1]

    if want("full_adam"):
        results["full_adam_us"] = slope_time(scan_full, state) * 1e6

    # ---- adam_only: optimizer update alone on frozen grads ----
    grads = jax.jit(jax.grad(lambda pp: loss_of(pp, b.noised_coors)))(params)

    import optax

    @partial(jax.jit, static_argnames=("length",), donate_argnums=(0,))
    def scan_adam(carry, length):
        def body(c, _):
            p, o = c
            upd, o = tx.update(grads, o, p)
            p = optax.apply_updates(p, upd)
            return (p, o), jnp.zeros(())
        (p, o), _ = jax.lax.scan(body, carry, None, length=length)
        return (p, o), jax.tree_util.tree_leaves(p)[0].sum()

    if want("adam_only"):
        results["adam_only_us"] = slope_time(
            scan_adam,
            (jax.tree.map(jnp.copy, params), tx.init(params))) * 1e6

    # ---- fused variants: the flat-buffer Adam bench.py now uses ----
    from egnn_tpu.training import make_fused_adam

    ftx = make_fused_adam(1e-3)

    @partial(jax.jit, static_argnames=("length",), donate_argnums=(0,))
    def scan_fused_only(carry, length):
        def body(c, _):
            p, o = c
            upd, o = ftx.update(grads, o, p)
            p = optax.apply_updates(p, upd)
            return (p, o), jnp.zeros(())
        (p, o), _ = jax.lax.scan(body, carry, None, length=length)
        return (p, o), jax.tree_util.tree_leaves(p)[0].sum()

    if want("fused_only"):
        results["fused_only_us"] = slope_time(
            scan_fused_only,
            (jax.tree.map(jnp.copy, params), ftx.init(params))) * 1e6

    fstate = TrainState.create(jax.tree.map(jnp.copy, params), ftx)

    @partial(jax.jit, static_argnames=("length",), donate_argnums=(0,))
    def scan_full_fused(fs, length):
        def body(st, _):
            st, l = step_fn(st, b.tokens, b.noised_coors, b.clean_coors,
                            b.adj_mat, b.mask)
            return st, l
        s, ls = jax.lax.scan(body, fs, None, length=length)
        return s, ls[-1]

    if want("full_fused"):
        results["full_fused_us"] = slope_time(scan_full_fused, fstate) * 1e6

    for k, v in results.items():
        print(f"{k}: {v:.1f} us")
    print(json.dumps({k: round(v, 1) for k, v in results.items()}))


if __name__ == "__main__":
    main()
