"""Weight migration from the reference torch `egnn-pytorch` package.

Users switching frameworks can carry trained checkpoints over: each function
maps a reference torch module's state onto this package's flax parameter
pytree (wrap with ``{"params": ...}`` for ``Module.apply``). The conversions
are the same ones the activation-parity tests use to pin numerics
(tests/test_parity_reference.py), so converted weights reproduce reference
outputs to float64 tolerance.

torch is imported lazily — the package itself has no torch dependency.

Layout notes:
- torch ``nn.Linear`` stores (out, in); flax expects (in, out) — transposed.
- reference Sequentials interleave Dropout/SiLU; Linear positions are (0, 3)
  in every MLP of both the dense (egnn_pytorch.py:178-208) and sparse
  (egnn_pytorch_geometric.py:143-172) layers.
"""
from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp


def _t2j(t) -> jnp.ndarray:
    return jnp.asarray(t.detach().cpu().numpy())


def _copy_mlp(params: Dict[str, Any], prefix: str, seq, linear_positions=(0, 3)):
    for our_idx, pos in enumerate(linear_positions):
        lin = seq[pos]
        params[f"{prefix}_{our_idx}_w"] = _t2j(lin.weight).T
        params[f"{prefix}_{our_idx}_b"] = _t2j(lin.bias)


def egnn_params_from_torch(torch_layer) -> Dict[str, Any]:
    """Reference ``EGNN`` (dense layer) -> params dict for egnn_tpu.EGNN."""
    import torch

    p: Dict[str, Any] = {}
    _copy_mlp(p, "edge_mlp", torch_layer.edge_mlp)
    if torch_layer.coors_mlp is not None:
        _copy_mlp(p, "coors_mlp", torch_layer.coors_mlp)
    if torch_layer.node_mlp is not None:
        _copy_mlp(p, "node_mlp", torch_layer.node_mlp)
    if torch_layer.edge_gate is not None:
        p["edge_gate_w"] = _t2j(torch_layer.edge_gate[0].weight).T
        p["edge_gate_b"] = _t2j(torch_layer.edge_gate[0].bias)
    if isinstance(torch_layer.node_norm, torch.nn.LayerNorm):
        p["node_norm_gamma"] = _t2j(torch_layer.node_norm.weight)
        p["node_norm_beta"] = _t2j(torch_layer.node_norm.bias)
    if hasattr(torch_layer.coors_norm, "scale"):
        p["coors_norm_scale"] = _t2j(torch_layer.coors_norm.scale)
    return p


def egnn_sparse_params_from_torch(torch_layer) -> Dict[str, Any]:
    """Reference ``EGNN_Sparse`` -> params dict for egnn_tpu.EGNNSparse."""
    p: Dict[str, Any] = {}
    _copy_mlp(p, "edge_mlp", torch_layer.edge_mlp)
    if torch_layer.coors_mlp is not None:
        _copy_mlp(p, "coors_mlp", torch_layer.coors_mlp)
    if torch_layer.node_mlp is not None:
        _copy_mlp(p, "node_mlp", torch_layer.node_mlp)
    if torch_layer.edge_weight is not None:
        p["edge_weight_w"] = _t2j(torch_layer.edge_weight[0].weight).T
        p["edge_weight_b"] = _t2j(torch_layer.edge_weight[0].bias)
    if torch_layer.node_norm is not None:
        p["node_norm_gamma"] = _t2j(torch_layer.node_norm.weight)
        p["node_norm_beta"] = _t2j(torch_layer.node_norm.bias)
    if hasattr(torch_layer.coors_norm, "scale"):
        p["coors_norm_scale"] = _t2j(torch_layer.coors_norm.scale)
    return p


def _attention_params_from_torch(attn) -> Dict[str, Any]:
    return {
        "to_q_w": _t2j(attn.to_q.weight).T,
        "to_kv_w": _t2j(attn.to_kv.weight).T,
        "to_out_w": _t2j(attn.to_out.weight).T,
        "to_out_b": _t2j(attn.to_out.bias),
    }


def egnn_network_params_from_torch(torch_net) -> Dict[str, Any]:
    """Reference ``EGNN_Network`` -> params dict for egnn_tpu.EGNNNetwork.

    Covers token/pos/edge/adjacency-degree embeddings, the learned global
    tokens, every EGNN layer, and interleaved GlobalLinearAttention blocks
    (egnn_pytorch.py:343-454)."""
    p: Dict[str, Any] = {}
    if torch_net.token_emb is not None:
        p["token_emb"] = _t2j(torch_net.token_emb.weight)
    if torch_net.pos_emb is not None:
        p["pos_emb"] = _t2j(torch_net.pos_emb.weight)
    if torch_net.edge_emb is not None:
        p["edge_emb"] = _t2j(torch_net.edge_emb.weight)
    if torch_net.adj_emb is not None:
        p["adj_emb"] = _t2j(torch_net.adj_emb.weight)
    if torch_net.global_tokens is not None:
        p["global_tokens"] = _t2j(torch_net.global_tokens)
    for ind, (gattn, egnn) in enumerate(torch_net.layers):
        p[f"egnn_{ind}"] = egnn_params_from_torch(egnn)
        if gattn is not None:
            ga: Dict[str, Any] = {
                "norm_seq_gamma": _t2j(gattn.norm_seq.weight),
                "norm_seq_beta": _t2j(gattn.norm_seq.bias),
                "norm_queries_gamma": _t2j(gattn.norm_queries.weight),
                "norm_queries_beta": _t2j(gattn.norm_queries.bias),
                "attn1": _attention_params_from_torch(gattn.attn1),
                "attn2": _attention_params_from_torch(gattn.attn2),
                # torch ff: [LayerNorm, Linear, GELU, Linear]
                "ff_norm_gamma": _t2j(gattn.ff[0].weight),
                "ff_norm_beta": _t2j(gattn.ff[0].bias),
                "ff_w1": _t2j(gattn.ff[1].weight).T,
                "ff_b1": _t2j(gattn.ff[1].bias),
                "ff_w2": _t2j(gattn.ff[3].weight).T,
                "ff_b2": _t2j(gattn.ff[3].bias),
            }
            p[f"global_attn_{ind}"] = ga
    return p


def egnn_sparse_network_params_from_torch(torch_net) -> Dict[str, Any]:
    """Reference ``EGNN_Sparse_Network`` -> params dict for
    egnn_tpu.EGNNSparseNetwork (embedding tables ``emb_i``/``edge_emb_i``,
    per-layer ``mpnn_i`` from the reference's mpnn_layers,
    egnn_pytorch_geometric.py:334-346)."""
    p: Dict[str, Any] = {}
    for i, emb in enumerate(torch_net.emb_layers):
        p[f"emb_{i}"] = _t2j(emb.weight)
    for i, emb in enumerate(torch_net.edge_emb_layers):
        p[f"edge_emb_{i}"] = _t2j(emb.weight)
    for i, layer in enumerate(torch_net.mpnn_layers):
        if not hasattr(layer, "edge_mlp"):
            # global_linear_attn_every>0 nets store ModuleList([EGNN_Sparse,
            # attn]) entries (egnn_pytorch_geometric.py:360-364); the
            # reference's sparse global-attn forward is itself broken, so
            # these checkpoints carry no usable attention weights to port.
            raise ValueError(
                "mpnn_layers[%d] is not a plain EGNN_Sparse (a ModuleList "
                "from global_linear_attn_every>0?); sparse global-attention "
                "reference checkpoints are not portable — port the plain "
                "layers via entry[0] manually if that is what you want" % i
            )
        p[f"mpnn_{i}"] = egnn_sparse_params_from_torch(layer)
    return p
