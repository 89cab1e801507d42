"""Migrate a trained reference (egnn-pytorch) model into egnn_tpu.

The switch path for existing users: take an ``EGNN_Network`` checkpoint from
the torch reference, convert its weights with the public migration API
(`egnn_tpu.utils.egnn_network_params_from_torch`), verify activation-level
agreement in float64, and save an orbax checkpoint that TPU training/serving
can resume from.

Requires torch + the reference package on PYTHONPATH (both present in this
repo's environment at /root/reference); exits gracefully otherwise.

Run: python examples/migrate_from_torch.py [--out DIR]
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", type=str, default="/tmp/egnn_tpu_migrated")
    ap.add_argument("--reference", type=str, default="/root/reference")
    args = ap.parse_args()

    try:
        import torch

        sys.path.insert(0, args.reference)
        from egnn_pytorch.egnn_pytorch import EGNN_Network as TorchNet
    except Exception as e:  # pragma: no cover
        print(f"reference/torch unavailable ({e}); nothing to migrate")
        return

    import jax

    jax.config.update("jax_platforms", "cpu")  # f64 verification runs on CPU
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import numpy as np

    from egnn_tpu import EGNNNetwork
    from egnn_tpu.training import CheckpointManager, TrainState, make_adam
    from egnn_tpu.utils import egnn_network_params_from_torch

    # A "trained" reference model (stand-in: the reference's denoise example
    # config, denoise_sparse.py:23-32, with whatever weights it has).
    torch.set_default_dtype(torch.float64)
    torch.manual_seed(0)
    cfg = dict(depth=3, dim=16, num_tokens=21, num_positions=64,
               num_nearest_neighbors=8, norm_coors=True,
               coor_weights_clamp_value=2.0)
    tnet = TorchNet(**cfg)

    # 1. convert weights
    params = egnn_network_params_from_torch(tnet)
    jnet = EGNNNetwork(
        depth=cfg["depth"], dim=cfg["dim"], num_tokens=cfg["num_tokens"],
        num_positions=cfg["num_positions"],
        layer_kwargs=dict(
            num_nearest_neighbors=cfg["num_nearest_neighbors"],
            norm_coors=cfg["norm_coors"],
            coor_weights_clamp_value=cfg["coor_weights_clamp_value"],
        ),
    )

    # 2. verify activation-level agreement in f64
    n = 48
    rng = np.random.RandomState(1)
    tokens = rng.randint(0, 21, size=(1, n))
    coors = rng.randn(1, n, 3)
    mask = np.ones((1, n), bool)
    with torch.no_grad():
        tf, tc = tnet(torch.tensor(tokens), torch.tensor(coors),
                      mask=torch.tensor(mask))
    jf, jc = jnet.apply({"params": params}, jnp.asarray(tokens),
                        jnp.asarray(coors), mask=jnp.asarray(mask))
    err_f = float(np.abs(np.asarray(jf) - tf.numpy()).max())
    err_c = float(np.abs(np.asarray(jc) - tc.numpy()).max())
    print(f"activation agreement: |feats| {err_f:.2e}  |coors| {err_c:.2e}")
    assert err_f < 1e-8 and err_c < 1e-8, "migration mismatch"

    # 3. persist as an orbax checkpoint ready for TPU training/serving
    state = TrainState.create(params, make_adam(1e-3))
    mgr = CheckpointManager(args.out, async_save=False)
    mgr.save(0, state)
    mgr.wait()
    restored = mgr.restore(state)
    mgr.close()
    for a, b in zip(jax.tree_util.tree_leaves(restored.params),
                    jax.tree_util.tree_leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    print(f"migrated checkpoint written to {args.out} (step 0) and "
          f"round-trips exactly")


if __name__ == "__main__":
    main()
