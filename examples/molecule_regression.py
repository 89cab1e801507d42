"""Molecular property regression on the sparse/COO path — the BASELINE.md
anchor-config-5 workload: batched variable-size graphs (QM9-style molecules)
packed into one static node set, kNN edge construction on device, an
EGNNSparseNetwork trunk, and an invariant masked-mean readout.

The dataset is synthetic (QM9 itself is external to both frameworks): random
"molecules" of 8..28 atoms with per-type charges; the regression target is a
Coulomb-like energy  E = sum_{i<j} q_i q_j / r_ij  — rotation/translation
invariant, so an E(n)-invariant readout can fit it.

Everything is static-shape: per-graph node capacity NA, kNN=K edges per node,
boolean masks for padding — the TPU idiom for variable-size graphs
(SURVEY.md §7 "hard parts" (1)).

Run: python examples/molecule_regression.py --steps 200 [--cpu]
"""
from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--graphs", type=int, default=32, help="molecules per batch")
    ap.add_argument("--na", type=int, default=32, help="per-molecule node capacity")
    ap.add_argument("--knn", type=int, default=8)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--layers", type=int, default=4)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--block", type=int, default=10,
                    help="steps per jitted lax.scan dispatch (amortizes "
                    "remote-TPU dispatch latency; on-device graph path only)")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument(
        "--host-graphs", action="store_true",
        help="build batches on host (native C++ kNN + prefetch thread) "
        "instead of on-device — the real-dataset input-pipeline path",
    )
    ap.add_argument("--qm9", type=str, default=None,
                    help="train on a QM9-format npz file "
                    "(training.datasets.QM9Dataset; padded R/Z or flat "
                    "R/Z/N layouts) instead of synthetic molecules")
    ap.add_argument("--make-qm9", type=str, default=None,
                    help="write a synthetic QM9-format npz here first (file-"
                    "pipeline smoke test without the external dataset)")
    ap.add_argument("--qm9-target", type=str, default=None,
                    help="target array key in the npz (default: first of "
                    "y/U0/targets/T)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    # persistent compilation cache: first run compiles (~30-60 s),
    # later runs start in seconds (same setting the test suite uses)
    jax.config.update(
        "jax_compilation_cache_dir",
        str(Path(__file__).resolve().parent.parent / ".jax_cache"),
    )
    import flax.linen as nn
    import jax.numpy as jnp
    import optax

    from egnn_tpu import EGNNSparseNetwork
    from egnn_tpu.models import init as inits
    from egnn_tpu.ops.graph import knn_graph
    from egnn_tpu.ops.segment import segment_mean
    from egnn_tpu.training import TrainState

    G, NA, K = args.graphs, args.na, args.knn
    N = G * NA
    qm9 = None
    if args.make_qm9:
        from egnn_tpu.training.datasets import make_synthetic_qm9_file
        make_synthetic_qm9_file(args.make_qm9, max_atoms=min(args.na, 29))
        args.qm9 = args.qm9 or args.make_qm9
        print(f"wrote synthetic QM9-format file: {args.make_qm9}")
    if args.qm9:
        from egnn_tpu.training.datasets import QM9Dataset
        qm9 = QM9Dataset.load(args.qm9, target_key=args.qm9_target)
        qm9_y, qm9_mu, qm9_sd = qm9.normalized_targets()
        print(f"QM9 file: {qm9.num_molecules} molecules, max "
              f"{qm9.max_atoms} atoms; target mu={qm9_mu:.3f} sd={qm9_sd:.3f}")
    NUM_TYPES = 6 if qm9 is not None else 5  # QM9: H C N O F + padding token
    CHARGES = jnp.asarray([-0.8, -0.3, 0.1, 0.5, 1.0])

    def pack_batch(coors, types, node_mask):
        """(G, NA) padded molecules -> packed (N,) layout with on-device
        per-molecule kNN edges (offset into the packed node set)."""
        es = jax.vmap(lambda co, m: knn_graph(co, K, node_mask=m))(coors, node_mask)
        off = (jnp.arange(G, dtype=jnp.int32) * NA)[:, None]
        senders = (es.senders + off).reshape(-1)
        receivers = (es.receivers + off).reshape(-1)
        edge_mask = es.mask.reshape(-1)
        edge_index = jnp.stack([senders, receivers], axis=0)    # (2, G*NA*K)
        batch_ids = jnp.repeat(jnp.arange(G, dtype=jnp.int32), NA)
        x = jnp.concatenate(
            [coors.reshape(N, 3), types.reshape(N, 1).astype(coors.dtype)], axis=-1
        )
        return x, edge_index, edge_mask, batch_ids, node_mask.reshape(N)

    def make_batch(key):
        """Random molecules + Coulomb-like targets, packed (N,) layout."""
        k_typ, k_len, k_pos = jax.random.split(key, 3)
        types = jax.random.randint(k_typ, (G, NA), 0, NUM_TYPES)
        lengths = jax.random.randint(k_len, (G, 1), 8, NA + 1)
        node_mask = jnp.arange(NA)[None, :] < lengths          # (G, NA)
        coors = 2.0 * jax.random.normal(k_pos, (G, NA, 3))

        # target: sum_{i<j, valid} q_i q_j / r_ij
        q = CHARGES[types]
        pm = node_mask[:, :, None] & node_mask[:, None, :]
        pm = pm & ~jnp.eye(NA, dtype=bool)[None]
        rel = coors[:, :, None, :] - coors[:, None, :, :]
        r = jnp.sqrt(jnp.clip(jnp.sum(rel**2, -1), min=1e-2))
        e_pair = q[:, :, None] * q[:, None, :] / r
        target = 0.5 * jnp.where(pm, e_pair, 0.0).sum(axis=(1, 2))  # (G,)

        return (*pack_batch(coors, types, node_mask), target)

    class Regressor(nn.Module):
        """EGNNSparseNetwork trunk + invariant masked-mean readout."""

        @nn.compact
        def __call__(self, x, edge_index, edge_mask, batch_ids, node_mask):
            trunk = EGNNSparseNetwork(
                n_layers=args.layers,
                feats_dim=1,                      # the raw type column
                embedding_nums=[NUM_TYPES],       # -> embedded to args.dim
                embedding_dims=[args.dim],
                fourier_features=4,
                norm_feats=True,
                norm_coors=True,
                aggr="add",
                # kNN batches are receiver-major with exactly K slots per
                # node -> scatter-free aggregation (1.5x fwd+bwd on v5e)
                uniform_degree=K,
                # equal-size padded molecules in a contiguous batch ->
                # block-local MXU gathers + reshape LayerNorm stats
                # (2.5x network fwd+bwd on v5e, benchmarks/breakdown_anchor5)
                uniform_graph_size=NA,
            )
            out = trunk(
                x, edge_index,
                batch=batch_ids,
                edge_mask=edge_mask & node_mask[edge_index[1]],
                num_graphs=G,
                node_mask=node_mask,  # keeps padding out of LayerNorm stats
            )
            feats = out[:, 3:]
            feats = jnp.where(node_mask[:, None], feats, 0.0)
            pooled = segment_mean(feats, batch_ids, G, mask=node_mask)  # (G, dim)
            w1 = self.param("head_w1", inits.xavier_normal_init, (feats.shape[-1], args.dim))
            b1 = self.param("head_b1", inits.zeros_init, (args.dim,))
            w2 = self.param("head_w2", inits.xavier_normal_init, (args.dim, 1))
            b2 = self.param("head_b2", inits.zeros_init, (1,))
            h = jax.nn.silu(pooled @ w1 + b1)
            return (h @ w2 + b2)[:, 0]

    model = Regressor()
    key = jax.random.PRNGKey(0)
    sample = make_batch(key)
    params = jax.jit(model.init)(key, *sample[:5])["params"]
    n_params = sum(p.size for p in jax.tree_util.tree_leaves(params))
    print(f"params: {n_params:,}")

    state = TrainState.create(params, optax.adam(args.lr))

    @jax.jit
    def train_step(state, key):
        x, ei, em, bi, nm, target = make_batch(key)

        def loss_of(p):
            pred = model.apply({"params": p}, x, ei, em, bi, nm)
            return ((pred - target) ** 2).mean(), jnp.abs(pred - target).mean()

        (loss, mae), grads = jax.value_and_grad(loss_of, has_aux=True)(state.params)
        return state.apply_gradients(grads), loss, mae

    if qm9 is not None:
        # Real-data pipeline: host sampling from the npz file, device-side
        # graph build + train step (normalized target; MAE reported in the
        # file's units too).
        import numpy as np

        rng = np.random.RandomState(0)

        @jax.jit
        def qm9_step(state, coors, types, node_mask, target):
            packed = pack_batch(coors, types, node_mask)

            def loss_of(p):
                pred = model.apply({"params": p}, *packed)
                return ((pred - target) ** 2).mean(), jnp.abs(pred - target).mean()

            (loss, mae), grads = jax.value_and_grad(loss_of, has_aux=True)(
                state.params)
            return state.apply_gradients(grads), loss, mae

        t0 = time.perf_counter()
        for step in range(args.steps):
            coors, types, nmask, y = qm9.batch(rng, G, NA, targets=qm9_y)
            state, loss, mae = qm9_step(state, jnp.asarray(coors),
                                        jnp.asarray(types), jnp.asarray(nmask),
                                        jnp.asarray(y))
            if step % max(1, args.steps // 10) == 0 or step == args.steps - 1:
                print(f"step {step:5d}  mse {float(loss):9.4f}  "
                      f"mae {float(mae):8.4f}  "
                      f"mae[file units] {float(mae) * qm9_sd:10.4f}")
    elif args.host_graphs:
        # Host input pipeline: the native C++ graph builder constructs kNN
        # edges on a worker thread (egnn_tpu/native), prefetched to device —
        # graph build overlaps device compute.
        import numpy as np

        from egnn_tpu import native
        from egnn_tpu.training.data import (
            PrefetchLoader, synthetic_molecule_batch_np)

        print(f"host graph builder: native={native.is_available()} "
              f"threads={native.num_threads()}")
        rng = np.random.RandomState(0)

        @jax.jit
        def host_train_step(state, batch):
            def loss_of(p):
                pred = model.apply(
                    {"params": p}, batch.x, batch.edge_index,
                    batch.edge_mask, batch.batch_ids, batch.node_mask)
                err = pred - batch.target
                return (err**2).mean(), jnp.abs(err).mean()

            (loss, mae), grads = jax.value_and_grad(loss_of, has_aux=True)(
                state.params)
            return state.apply_gradients(grads), loss, mae

        loader = PrefetchLoader(
            lambda: synthetic_molecule_batch_np(rng, G, NA, K),
            num_batches=args.steps,
        )
        t0 = time.perf_counter()
        for step, batch in enumerate(loader):
            state, loss, mae = host_train_step(state, batch)
            if step % max(1, args.steps // 10) == 0 or step == args.steps - 1:
                print(f"step {step:5d}  mse {float(loss):9.4f}  mae {float(mae):8.4f}")
        loader.close()
    else:
        from functools import partial

        @partial(jax.jit, static_argnames=("length",), donate_argnums=(0,))
        def run_block(state, k, length):
            def body(carry, _):
                st, kk = carry
                kk, sub = jax.random.split(kk)
                st, loss, mae = train_step_inner(st, sub)
                return (st, kk), (loss, mae)
            (state, k), (losses, maes) = jax.lax.scan(
                body, (state, k), None, length=length)
            return state, k, losses[-1], maes[-1]

        def train_step_inner(state, key):
            x, ei, em, bi, nm, target = make_batch(key)

            def loss_of(p):
                pred = model.apply({"params": p}, x, ei, em, bi, nm)
                return ((pred - target) ** 2).mean(), jnp.abs(pred - target).mean()

            (loss, mae), grads = jax.value_and_grad(loss_of, has_aux=True)(
                state.params)
            return state.apply_gradients(grads), loss, mae

        t0 = time.perf_counter()
        done = 0
        while done < args.steps:
            length = min(max(1, args.block), args.steps - done)
            state, key, loss, mae = run_block(state, key, length)
            done += length
            print(f"step {done - 1:5d}  mse {float(loss):9.4f}  mae {float(mae):8.4f}")
    dt = time.perf_counter() - t0
    eps = args.steps * G * NA * K * args.layers / dt
    print(f"{args.steps} steps in {dt:.1f}s  ({eps/1e6:.2f} M edges/s incl. graph build)")


if __name__ == "__main__":
    main()
