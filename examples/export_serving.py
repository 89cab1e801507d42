"""Serving export: AOT-compile the EGNN forward into a portable StableHLO
artifact with jax.export — the deployment path for inference servers (no
Python model code or flax needed at load time, just jax + the artifact).

Run: python examples/export_serving.py [--out /tmp/egnn_fwd.bin] [--cpu]
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", type=str, default="/tmp/egnn_fwd.bin")
    ap.add_argument("--nodes", type=int, default=256)
    ap.add_argument("--dim", type=int, default=32)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax import export as jexport

    from egnn_tpu import EGNNNetwork

    n, dim = args.nodes, args.dim
    net = EGNNNetwork(
        depth=3, dim=dim, num_tokens=21, num_positions=n,
        layer_kwargs=dict(num_nearest_neighbors=8, norm_coors=True,
                          coor_weights_clamp_value=2.0),
    )
    key = jax.random.PRNGKey(0)
    tokens = jax.random.randint(key, (1, n), 0, 21)
    coors = jax.random.normal(key, (1, n, 3), jnp.float32)
    params = jax.jit(net.init)(key, tokens, coors)

    def forward(params, tokens, coors):
        return net.apply(params, tokens, coors)

    exp = jexport.export(jax.jit(forward))(params, tokens, coors)
    blob = exp.serialize()
    Path(args.out).write_bytes(blob)
    print(f"exported {len(blob):,} bytes "
          f"(platforms={exp.platforms}, funcs frozen to StableHLO)")

    # round trip: reload the artifact and run it — this is all a server needs
    reloaded = jexport.deserialize(blob)
    f1, c1 = forward(params, tokens, coors)
    f2, c2 = reloaded.call(params, tokens, coors)
    import numpy as np

    np.testing.assert_allclose(np.asarray(f1), np.asarray(f2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), atol=1e-6)
    print("reloaded artifact reproduces the in-process forward")


if __name__ == "__main__":
    main()
