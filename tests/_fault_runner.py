"""Subprocess trainer for the fault-injection test (tests/test_fault_recovery.py).

Trains a tiny EGNN denoiser with per-step synchronous checkpoints. In
``--kill-at K`` mode it SIGKILLs its own process right after saving step K —
simulating a host failure mid-run. A later invocation without ``--kill-at``
resumes from the latest checkpoint and finishes, printing
``FINAL step=<n> loss=<x>`` for the parent test to compare against an
uninterrupted run (batches are keyed by step, so recovery must be bit-exact).
"""
import argparse
import os
import signal
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

from egnn_tpu import EGNN  # noqa: E402
from egnn_tpu.training import TrainState, make_adam  # noqa: E402
from egnn_tpu.training.checkpoint import CheckpointManager  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt-dir", required=True)
    ap.add_argument("--steps", type=int, default=6)
    ap.add_argument("--kill-at", type=int, default=None)
    args = ap.parse_args()

    n, dim = 12, 8
    layer = EGNN(dim=dim)
    key = jax.random.PRNGKey(0)
    feats0 = jax.random.normal(key, (1, n, dim))
    coors0 = jax.random.normal(jax.random.PRNGKey(1), (1, n, 3))
    params = jax.jit(layer.init)(key, feats0, coors0)["params"]
    state = TrainState.create(params, make_adam(1e-3))

    @jax.jit
    def train_step(state, step):
        k = jax.random.fold_in(jax.random.PRNGKey(42), step)
        clean = jax.random.normal(k, (1, n, 3))
        noised = clean + 0.1 * jax.random.normal(jax.random.fold_in(k, 1), (1, n, 3))

        def loss_of(p):
            _, out = layer.apply({"params": p}, feats0, noised)
            return jnp.mean((out - clean) ** 2)

        loss, grads = jax.value_and_grad(loss_of)(state.params)
        return state.apply_gradients(grads), loss

    # synchronous saves: a SIGKILL right after save() must leave a complete,
    # atomic checkpoint on disk (orbax finalizes via rename)
    mgr = CheckpointManager(args.ckpt_dir, max_to_keep=2, async_save=False)
    start = 0
    latest = mgr.latest_step()
    if latest is not None:
        state = mgr.restore(state, step=latest)
        start = latest + 1
        print(f"RESUMED from step {latest}", flush=True)

    loss = jnp.nan
    for step in range(start, args.steps):
        state, loss = train_step(state, step)
        mgr.save(step, state)
        mgr.wait()
        if args.kill_at is not None and step == args.kill_at:
            print(f"KILLING at step {step}", flush=True)
            os.kill(os.getpid(), signal.SIGKILL)

    mgr.close()
    print(f"FINAL step={args.steps - 1} loss={float(loss):.17g}", flush=True)


if __name__ == "__main__":
    main()
