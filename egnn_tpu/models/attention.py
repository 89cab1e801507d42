"""Global attention blocks for EGNN networks.

TPU-native re-implementation of the reference's ``Attention`` /
``GlobalLinearAttention`` (egnn_pytorch.py:81-144): cross-attention with
induced global tokens (Set-Transformer style), so global context costs O(n),
not O(n^2). Matmuls are expressed as plain jnp einsum/dot so XLA maps them to
the MXU and fuses the elementwise epilogues.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.core import layer_norm
from . import init as inits


class Attention(nn.Module):
    """Multi-head cross attention: queries from ``x``, keys/values from
    ``context``; optional boolean key mask (egnn_pytorch.py:81-110).

    Fresh-init parity: the reference never applies ``EGNN.init_`` to its
    attention blocks (init_ touches only the EGNN module's own Linears,
    egnn_pytorch.py:219-222, :387), so reference attention always carries
    torch Linear defaults — kaiming_uniform(a=sqrt(5)) weights =
    U(+-1/sqrt(fan_in)), same-bound uniform bias (egnn_pytorch.py:88-90).
    Mirrored here distributionally via ``torch_linear_weight_init`` /
    ``torch_linear_bias_init``.
    """

    dim: int
    heads: int = 8
    dim_head: int = 64

    @nn.compact
    def __call__(self, x, context, mask: Optional[jnp.ndarray] = None):
        h, dh = self.heads, self.dim_head
        inner = h * dh
        scale = dh**-0.5

        wq = self.param("to_q_w", inits.torch_linear_weight_init, (self.dim, inner))
        wkv = self.param("to_kv_w", inits.torch_linear_weight_init, (self.dim, inner * 2))
        wo = self.param("to_out_w", inits.torch_linear_weight_init, (inner, self.dim))
        bo = self.param("to_out_b", inits.torch_linear_bias_init(inner), (self.dim,))

        q = x @ wq
        kv = context @ wkv
        k, v = jnp.split(kv, 2, axis=-1)

        def split_heads(t):
            b, n, _ = t.shape
            return t.reshape(b, n, h, dh).transpose(0, 2, 1, 3)

        q, k, v = map(split_heads, (q, k, v))
        dots = jnp.einsum("bhid,bhjd->bhij", q, k) * scale

        if mask is not None:
            big_neg = jnp.finfo(dots.dtype).max
            dots = jnp.where(mask[:, None, None, :], dots, -big_neg)

        attn = jax.nn.softmax(dots, axis=-1)
        out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(x.shape[0], x.shape[1], inner)
        return out @ wo + bo


class GlobalLinearAttention(nn.Module):
    """Induced-set global attention + feed-forward (egnn_pytorch.py:112-144).

    Two passes: (1) global query tokens attend over the node sequence ->
    ``induced``; (2) nodes attend back over ``induced``. Pre-LayerNorm on both
    streams, residuals on both, then a 4x GELU MLP with residual on the nodes.
    """

    dim: int
    heads: int = 8
    dim_head: int = 64

    @nn.compact
    def __call__(self, x, queries, mask: Optional[jnp.ndarray] = None):
        d = self.dim
        g_seq = self.param("norm_seq_gamma", inits.ones_init, (d,))
        b_seq = self.param("norm_seq_beta", inits.zeros_init, (d,))
        g_q = self.param("norm_queries_gamma", inits.ones_init, (d,))
        b_q = self.param("norm_queries_beta", inits.zeros_init, (d,))

        res_x, res_queries = x, queries
        xn = layer_norm(x, g_seq, b_seq)
        qn = layer_norm(queries, g_q, b_q)

        induced = Attention(d, self.heads, self.dim_head, name="attn1")(qn, xn, mask=mask)
        out = Attention(d, self.heads, self.dim_head, name="attn2")(xn, induced)

        x = out + res_x
        queries = induced + res_queries

        g_ff = self.param("ff_norm_gamma", inits.ones_init, (d,))
        b_ff = self.param("ff_norm_beta", inits.zeros_init, (d,))
        w1 = self.param("ff_w1", inits.torch_linear_weight_init, (d, d * 4))
        b1 = self.param("ff_b1", inits.torch_linear_bias_init(d), (d * 4,))
        w2 = self.param("ff_w2", inits.torch_linear_weight_init, (d * 4, d))
        b2 = self.param("ff_b2", inits.torch_linear_bias_init(d * 4), (d,))

        ff = layer_norm(x, g_ff, b_ff)
        ff = jax.nn.gelu(ff @ w1 + b1, approximate=False) @ w2 + b2
        x = ff + x
        return x, queries
