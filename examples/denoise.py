"""Coordinate-denoising training example — end-to-end parity with the
reference's denoise_sparse.py workload: EGNN_Network(depth 5, dim 8(+),
kNN 16, fourier 2, norm_coors, clamp 2.0, chain adjacency, pos embeddings),
Adam 1e-3 with 16-step grad accumulation, MSE on masked coordinates
(denoise_sparse.py:23-78) — but jitted, checkpointed (orbax), and on
synthetic chain data (sidechainnet is external to both frameworks).

Run: python examples/denoise.py --steps 50 [--cpu] [--ckpt-dir DIR]
"""
from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--nodes", type=int, default=384)
    ap.add_argument("--dim", type=int, default=32)
    ap.add_argument("--depth", type=int, default=5)
    ap.add_argument("--knn", type=int, default=16)
    ap.add_argument("--grad-accum", type=int, default=16)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--ckpt-dir", type=str, default=None)
    ap.add_argument("--metrics", type=str, default=None,
                    help="JSONL metrics path (parallel.MetricLogger)")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--block", type=int, default=10,
                    help="steps fused into one jitted lax.scan dispatch "
                    "(remote-TPU runtimes cost ~10-100 ms per dispatch; "
                    "blocking amortizes it)")
    ap.add_argument("--data", type=str, default=None,
                    help="backbone dataset file (npz/h5; "
                    "training.datasets.BackboneDataset). Trains on real "
                    "file-backed data via PrefetchLoader instead of in-jit "
                    "synthetic batches.")
    ap.add_argument("--make-data", type=str, default=None,
                    help="generate a synthetic backbone dataset file at this "
                    "path first (and train on it)")
    ap.add_argument("--noise", type=float, default=1.0)
    ap.add_argument("--data-proteins", type=int, default=64,
                    help="proteins in the generated dataset (--make-data); "
                    "the reference demo's 5x MSE anchor is a few-protein "
                    "memorization regime (egnn_test.ipynb trains one)")
    ap.add_argument("--from-sidechainnet", type=str, default=None,
                    metavar="PATH",
                    help="export real CASP12@30 backbones to a dataset file "
                    "at PATH first (needs the optional sidechainnet package; "
                    "mirrors the reference pipeline denoise_sparse.py:34-60) "
                    "and train on it")
    ap.add_argument("--casp-version", type=int, default=12)
    ap.add_argument("--casp-thinning", type=int, default=30)
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
    import jax.numpy as jnp

    from egnn_tpu import EGNNNetwork
    from egnn_tpu.training import (
        CheckpointManager,
        TrainState,
        make_adam,
        make_denoise_train_step,
        masked_mse,
    )
    from egnn_tpu.training.data import PrefetchLoader, synthetic_chain_batch
    from egnn_tpu.training.datasets import (
        BackboneDataset,
        make_synthetic_backbone_dataset,
    )
    import numpy as np

    print(f"devices: {jax.devices()}")
    dataset = None
    if args.from_sidechainnet:
        from egnn_tpu.training.datasets import export_sidechainnet

        export_sidechainnet(args.from_sidechainnet,
                            casp_version=args.casp_version,
                            thinning=args.casp_thinning,
                            max_len=args.nodes // 3)
        args.data = args.from_sidechainnet
        print(f"exported sidechainnet CASP{args.casp_version}@"
              f"{args.casp_thinning} to {args.data}")
    if args.make_data:
        make_synthetic_backbone_dataset(args.make_data,
                                        num_proteins=args.data_proteins,
                                        seq_len=args.nodes // 3)
        args.data = args.make_data
        print(f"wrote synthetic backbone dataset to {args.data}")
    if args.data:
        dataset = BackboneDataset.load(args.data)
        args.nodes = 3 * dataset.seq_len  # 3 backbone atoms per residue
        print(f"dataset: {dataset.num_proteins} proteins x "
              f"{dataset.seq_len} residues -> n={args.nodes} atoms")
    # --knn 0 selects the reference's DEFAULT all-pairs layer mode (no
    # neighbor restriction, egnn_pytorch.py:148 defaults) — the most robust
    # configuration for the denoising anchor, since kNN edges computed on
    # NOISED coordinates scramble under heavy noise while all-pairs (and the
    # notebook's topology-derived edges) stay stable.
    net = EGNNNetwork(
        depth=args.depth,
        dim=args.dim,
        num_tokens=21,
        num_positions=args.nodes,
        layer_kwargs=dict(
            num_nearest_neighbors=args.knn,
            fourier_features=2,
            norm_coors=True,
            coor_weights_clamp_value=2.0,
        ),
    )

    key = jax.random.PRNGKey(0)
    k_init, k_data = jax.random.split(key)
    batch0 = synthetic_chain_batch(k_data, args.batch, args.nodes)
    params = jax.jit(net.init)(
        k_init, batch0.tokens, batch0.noised_coors,
        adj_mat=batch0.adj_mat, mask=batch0.mask,
    )["params"]
    n_params = sum(p.size for p in jax.tree.leaves(params))
    print(f"params: {n_params:,}")

    tx = make_adam(args.lr, grad_accum=args.grad_accum)
    state = TrainState.create(params, tx)

    mgr = None
    if args.ckpt_dir:
        mgr = CheckpointManager(args.ckpt_dir)
        if args.resume and mgr.latest_step() is not None:
            state = mgr.restore(state)
            print(f"resumed from step {int(state.step)}")

    from egnn_tpu.parallel import MetricLogger
    from egnn_tpu.utils import finite_or_skip_step

    # loss-spike resilience: a non-finite update is skipped, loss reported
    # NaN. The guard re-reads the old state, so the inner step must not
    # donate; donation happens at the outer jit where XLA sees both uses.
    step_fn = finite_or_skip_step(
        make_denoise_train_step(net, masked_mse, donate=False)
    )

    # Block of steps inside ONE jitted lax.scan: batch generation + train
    # step fused, so a remote-TPU dispatch (~10-100 ms on tunneled runtimes)
    # is paid once per block, not 3x per step.
    from functools import partial

    @partial(jax.jit, static_argnames=("length",), donate_argnums=(0,))
    def run_block(state, k, length):
        def body(carry, _):
            st, kk = carry
            kk, kb = jax.random.split(kk)
            b = synthetic_chain_batch(kb, args.batch, args.nodes)
            st, loss = step_fn(
                st, b.tokens, b.noised_coors, b.clean_coors, b.adj_mat, b.mask
            )
            return (st, kk), loss
        (state, k), losses = jax.lax.scan(body, (state, k), None, length=length)
        return state, k, losses[-1]

    metrics = MetricLogger(args.metrics)
    eff_deg = args.knn if args.knn > 0 else args.nodes
    edges_per_step = args.batch * args.nodes * eff_deg * args.depth

    t0 = time.time()
    if dataset is not None:
        # file-backed pipeline: host-side batch assembly on a worker thread,
        # overlapped with device steps (PrefetchLoader)
        rng = np.random.RandomState(0)
        loader = PrefetchLoader(
            lambda: dataset.denoise_batch(rng, args.batch,
                                          noise_std=args.noise),
            depth=2, num_batches=args.steps,
        )
        for done, b in enumerate(loader, start=1):
            state, loss = step_fn(
                state, b.tokens, b.noised_coors, b.clean_coors, b.adj_mat,
                b.mask,
            )
            if done % max(1, args.block) == 0 or done == args.steps:
                loss_v = float(loss)
                metrics.log(done - 1, loss=loss_v,
                            edges_per_s=done * edges_per_step /
                            (time.time() - t0))
                print(f"step {done - 1:5d}  loss {loss_v:.4f}")
            if mgr is not None and done % 100 == 0:
                mgr.save(int(state.step), state)
        loader.close()
        done = args.steps
    else:
        block = max(1, args.block)
        done = 0
        while done < args.steps:
            length = min(block, args.steps - done)
            state, k_data, loss = run_block(state, k_data, length)
            done += length
            loss_v = float(loss)  # fetch: forces execution, feeds metrics
            dt_i = time.time() - t0
            metrics.log(done - 1, loss=loss_v,
                        edges_per_s=done * edges_per_step / dt_i)
            print(f"step {done - 1:5d}  loss {loss_v:.4f}")
            if mgr is not None and done % 100 == 0:
                mgr.save(int(state.step), state)
    jax.block_until_ready(state.params)
    dt = time.time() - t0
    print(f"{args.steps} steps in {dt:.2f}s ({args.steps / dt:.2f} steps/s)")

    # ---- learning-quality anchor (reference demo: egnn_test.ipynb:925,950
    # reports noised-baseline MSE vs reconstructed MSE, 0.980 -> 0.199) ----
    eval_rng = np.random.RandomState(12345)
    if dataset is not None:
        eb = dataset.denoise_batch(eval_rng, max(4, args.batch),
                                   noise_std=args.noise)
    else:
        eb = synthetic_chain_batch(jax.random.PRNGKey(999),
                                   max(4, args.batch), args.nodes)
    eb = jax.device_put(eb)

    @jax.jit
    def eval_mse(params, b):
        _, denoised = net.apply({"params": params}, b.tokens, b.noised_coors,
                                adj_mat=b.adj_mat, mask=b.mask)
        return (masked_mse(denoised, b.clean_coors, b.mask),
                masked_mse(b.noised_coors, b.clean_coors, b.mask))

    model_mse, base_mse = eval_mse(state.params, eb)
    model_mse, base_mse = float(model_mse), float(base_mse)
    red = base_mse / max(model_mse, 1e-12)
    print(f"eval MSE: noised baseline {base_mse:.4f} -> "
          f"denoised {model_mse:.4f}  ({red:.2f}x reduction)")

    if mgr is not None:
        mgr.save(int(state.step), state)
        mgr.wait()
        print(f"checkpointed at step {int(state.step)}")
        mgr.close()
    metrics.close()


if __name__ == "__main__":
    main()
