"""Euler-angle rotation helpers for equivariance tests (reference utils.py:4-19)."""
from __future__ import annotations

import jax.numpy as jnp


def rot_z(gamma):
    gamma = jnp.asarray(gamma)
    c, s = jnp.cos(gamma), jnp.sin(gamma)
    z = jnp.zeros_like(c)
    o = jnp.ones_like(c)
    return jnp.stack(
        [
            jnp.stack([c, -s, z], axis=-1),
            jnp.stack([s, c, z], axis=-1),
            jnp.stack([z, z, o], axis=-1),
        ],
        axis=-2,
    )


def rot_y(beta):
    beta = jnp.asarray(beta)
    c, s = jnp.cos(beta), jnp.sin(beta)
    z = jnp.zeros_like(c)
    o = jnp.ones_like(c)
    return jnp.stack(
        [
            jnp.stack([c, z, s], axis=-1),
            jnp.stack([z, o, z], axis=-1),
            jnp.stack([-s, z, c], axis=-1),
        ],
        axis=-2,
    )


def rot(alpha, beta, gamma):
    return rot_z(alpha) @ rot_y(beta) @ rot_z(gamma)
