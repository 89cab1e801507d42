"""Tensor parallelism (parallel/tp.py): Megatron column/row split of the
EGNN MLPs via GSPMD parameter shardings. Sharding must never change math —
outputs and gradients on the (1, 8) model mesh are compared against the
fully replicated run."""
import jax
import jax.numpy as jnp
import numpy as np

from egnn_tpu import EGNN, EGNNNetwork
from egnn_tpu.parallel.tp import make_tp_mesh, tp_param_sharding, tp_param_spec


def test_spec_rules():
    from jax.sharding import PartitionSpec as P

    assert tp_param_spec("edge_mlp_0_w") == P(None, "model")
    assert tp_param_spec("edge_mlp_0_b") == P("model")
    assert tp_param_spec("coors_mlp_1_w") == P("model", None)
    assert tp_param_spec("coors_mlp_1_b") == P()
    assert tp_param_spec("node_norm_gamma") == P()
    assert tp_param_spec("token_emb") == P()


def test_tp_layer_matches_replicated():
    mesh = make_tp_mesh(data=1, model=8)
    layer = EGNN(dim=64, m_dim=32)
    key = jax.random.PRNGKey(0)
    feats = jax.random.normal(key, (2, 16, 64))
    coors = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 3))
    params = jax.jit(layer.init)(key, feats, coors)

    ref_f, ref_c = jax.jit(layer.apply)(params, feats, coors)

    tp_params = jax.device_put(params, tp_param_sharding(params, mesh))
    # divisible hidden dims really are sharded (node MLP hidden = 2*dim=128);
    # the edge MLP hidden is 258 here, indivisible by 8 -> replicated
    leaf = tp_params["params"]["node_mlp_0_w"]
    assert len(leaf.sharding.spec) and leaf.sharding.spec[-1] == "model"
    assert tp_params["params"]["edge_mlp_0_w"].sharding.spec == ()
    f, c = jax.jit(layer.apply)(tp_params, feats, coors)
    np.testing.assert_allclose(np.asarray(f), np.asarray(ref_f), atol=1e-12)
    np.testing.assert_allclose(np.asarray(c), np.asarray(ref_c), atol=1e-12)


def test_tp_network_grads_match_replicated():
    mesh = make_tp_mesh(data=1, model=8)
    net = EGNNNetwork(depth=2, dim=32, num_tokens=7,
                      layer_kwargs=dict(num_nearest_neighbors=4))
    key = jax.random.PRNGKey(2)
    tokens = jax.random.randint(key, (1, 24), 0, 7)
    coors = jax.random.normal(jax.random.PRNGKey(3), (1, 24, 3))
    params = jax.jit(net.init)(key, tokens, coors)

    def loss(p):
        f, c = net.apply(p, tokens, coors)
        return jnp.sum(c**2) + jnp.sum(f**2)

    ref_l, ref_g = jax.jit(jax.value_and_grad(loss))(params)
    tp_params = jax.device_put(params, tp_param_sharding(params, mesh))
    l, g = jax.jit(jax.value_and_grad(loss))(tp_params)
    np.testing.assert_allclose(float(l), float(ref_l), rtol=1e-12)
    for a, b in zip(jax.tree_util.tree_leaves(g),
                    jax.tree_util.tree_leaves(ref_g)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-11)


def test_tp_hidden_padding_inert_and_shardable():
    """tp_hidden_multiple pads the edge-MLP hidden with EXACTLY inert units:
    same outputs as the reference-shaped layer (live weights injected), zero
    gradients on the pads, and the padded params actually shard 8-way."""
    d, n = 32, 24
    key = jax.random.PRNGKey(0)
    feats = jax.random.normal(key, (1, n, d))
    coors = jax.random.normal(jax.random.PRNGKey(1), (1, n, 3))

    base = EGNN(dim=d)
    padded = EGNN(dim=d, tp_hidden_multiple=16)  # hidden 130 -> 144
    pb = base.init(jax.random.PRNGKey(2), feats, coors)["params"]
    pp = padded.init(jax.random.PRNGKey(2), feats, coors)["params"]
    hidden = pb["edge_mlp_0_w"].shape[1]
    hp = pp["edge_mlp_0_w"].shape[1]
    assert hidden == 130 and hp == 144 and hp % 16 == 0

    # pads are zero at init
    assert not np.asarray(pp["edge_mlp_0_w"][:, hidden:]).any()
    assert not np.asarray(pp["edge_mlp_0_b"][hidden:]).any()
    assert not np.asarray(pp["edge_mlp_1_w"][hidden:]).any()

    # inject the base weights into the live region -> identical outputs
    pp2 = dict(pp)
    pp2["edge_mlp_0_w"] = pp["edge_mlp_0_w"].at[:, :hidden].set(pb["edge_mlp_0_w"])
    pp2["edge_mlp_0_b"] = pp["edge_mlp_0_b"].at[:hidden].set(pb["edge_mlp_0_b"])
    pp2["edge_mlp_1_w"] = pp["edge_mlp_1_w"].at[:hidden].set(pb["edge_mlp_1_w"])
    for k in pb:
        if not k.startswith("edge_mlp"):
            pp2[k] = pb[k]
    pp2["edge_mlp_1_b"] = pb["edge_mlp_1_b"]
    f0, c0 = base.apply({"params": pb}, feats, coors)
    f1, c1 = padded.apply({"params": pp2}, feats, coors)
    np.testing.assert_allclose(np.asarray(f0), np.asarray(f1), rtol=0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(c0), np.asarray(c1), rtol=0, atol=1e-12)

    # pad gradients are exactly zero (inert under training)
    def loss(p):
        f, c = padded.apply({"params": p}, feats, coors)
        return (f**2).mean() + (c**2).mean()

    g = jax.grad(loss)({k: jnp.asarray(v) for k, v in pp2.items()})
    assert not np.asarray(g["edge_mlp_0_w"][:, hidden:]).any()
    assert not np.asarray(g["edge_mlp_0_b"][hidden:]).any()
    assert not np.asarray(g["edge_mlp_1_w"][hidden:]).any()

    # and the padded widths shard on an 8-way model axis
    mesh = make_tp_mesh(data=1, model=8)
    sh = tp_param_sharding({"params": pp}, mesh)["params"]
    assert sh["edge_mlp_0_w"].spec == tp_param_spec("edge_mlp_0_w")
    assert sh["edge_mlp_1_w"].spec == tp_param_spec("edge_mlp_1_w")
