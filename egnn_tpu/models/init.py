"""Parameter initializers matching the reference's schemes.

- Dense path: every Linear weight ~ Normal(0, init_eps=1e-3) (egnn_pytorch.py:219-222)
  while biases keep torch's default Linear init U(-1/sqrt(fan_in), 1/sqrt(fan_in)).
- Sparse path: xavier_normal weights, zero biases (egnn_pytorch_geometric.py:176-180).

Weights are stored (in_dim, out_dim) — the JAX convention; torch stores
(out, in), so parity tests transpose when injecting reference weights.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.core import default_float


def _box_muller_normal(key, shape, dtype):
    """Standard normals via Box-Muller from uniforms.

    jax.random.normal's float64 path (erf_inv) is orders of magnitude slower on
    CPU; Box-Muller is two uniforms + log/cos and statistically equivalent.
    """
    k1, k2 = jax.random.split(key)
    tiny = jnp.finfo(dtype).tiny
    u1 = jax.random.uniform(k1, shape, dtype=dtype, minval=tiny, maxval=1.0)
    u2 = jax.random.uniform(k2, shape, dtype=dtype)
    return jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(2.0 * jnp.pi * u2)


def normal_init(std: float):
    def init(key, shape):
        return std * _box_muller_normal(key, shape, default_float())

    return init


def torch_linear_bias_init(fan_in: int):
    """torch.nn.Linear default bias: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    bound = 1.0 / (fan_in**0.5)

    def init(key, shape):
        return jax.random.uniform(
            key, shape, dtype=default_float(), minval=-bound, maxval=bound
        )

    return init


def torch_linear_weight_init(key, shape):
    """torch.nn.Linear default weight init for (in, out)-stored weights.

    torch uses kaiming_uniform(a=sqrt(5)) on the (out, in) matrix, which
    reduces to U(-1/sqrt(fan_in), 1/sqrt(fan_in)) with fan_in = in_features
    (torch.nn.modules.linear reset_parameters). Distributionally identical
    here with fan_in = shape[-2].
    """
    bound = 1.0 / (shape[-2] ** 0.5)
    return jax.random.uniform(
        key, shape, dtype=default_float(), minval=-bound, maxval=bound
    )


def xavier_normal_init(key, shape):
    """Gaussian with std sqrt(2 / (fan_in + fan_out)) for (in, out) weights."""
    fan_in, fan_out = shape[-2], shape[-1]
    std = (2.0 / (fan_in + fan_out)) ** 0.5
    return std * _box_muller_normal(key, shape, default_float())


def zeros_init(key, shape):
    del key
    return jnp.zeros(shape, dtype=default_float())


def ones_init(key, shape):
    del key
    return jnp.ones(shape, dtype=default_float())


def constant_init(value: float):
    def init(key, shape):
        del key
        return jnp.full(shape, value, dtype=default_float())

    return init


def unit_normal_init(key, shape):
    return _box_muller_normal(key, shape, default_float())


def zero_pad_axis(base_init, axis: int, valid: int):
    """Run ``base_init`` on the first ``valid`` entries along ``axis`` and
    zero the rest — inert-padding init for TP-divisible hidden widths
    (models/egnn.py tp_hidden_multiple). The base init sees the VALID shape,
    so the live region's values match the unpadded parameterization draw for
    draw."""

    def init(key, shape):
        vshape = tuple(valid if i == axis else s for i, s in enumerate(shape))
        core = base_init(key, vshape)
        pad = [(0, s - v) for s, v in zip(shape, vshape)]
        return jnp.pad(core, pad)

    return init
