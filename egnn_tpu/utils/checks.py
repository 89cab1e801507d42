"""Numerical sanitizers (SURVEY.md §5.2 — the JAX analog of race detectors).

Nothing can data-race in a pure functional program; what goes wrong instead
is numerics (NaN/Inf from exploding coordinate updates) and out-of-bounds
gathers on padded edge lists (silently clamped by XLA). These helpers make
both loud:

- ``guard_finite(tree, name)``   — ``checkify``-able assertion that every
                                   leaf is finite; jit-compatible.
- ``checked(fn)``                — wrap a jitted fn with ``checkify`` so
                                   ``guard_finite``/``checkify.check`` calls
                                   inside raise on the host.
- ``assert_in_bounds(idx, n)``   — edge-index bounds check.
- ``finite_or_skip_step``        — train-step wrapper: if the grads contain
                                   non-finite values, skip the update and
                                   report (loss-spike resilience for
                                   production runs).

Pallas kernels have their own sanitizer: run with ``interpret=True`` (every
kernel here exposes that flag) — the tests in tests/test_pallas_*.py do.
"""
from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax.experimental import checkify


def guard_finite(tree: Any, name: str = "value") -> None:
    """Inside a ``checked``/checkify context: error if any leaf is non-finite."""
    for i, leaf in enumerate(jax.tree_util.tree_leaves(tree)):
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
            checkify.check(
                jnp.isfinite(leaf).all(), f"non-finite values in {name}[leaf {i}]"
            )


def assert_in_bounds(indices: jnp.ndarray, n: int, name: str = "index") -> None:
    """Inside a ``checked`` context: error on out-of-range gather indices —
    XLA clamps these silently, which corrupts padded-edge aggregations."""
    checkify.check(
        ((indices >= 0) & (indices < n)).all(),
        f"{name} out of bounds for size {n}",
    )


def checked(fn: Callable, *, errors=checkify.user_checks) -> Callable:
    """checkify+jit wrapper: returns a callable that raises ValueError on the
    host when any guard fires."""
    cfn = jax.jit(checkify.checkify(fn, errors=errors))

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        err, out = cfn(*args, **kwargs)
        checkify.check_error(err)
        return out

    return wrapper


def tree_all_finite(tree: Any) -> jnp.ndarray:
    """Scalar bool: every floating leaf finite (usable under jit, no checkify)."""
    ok = jnp.asarray(True)
    for leaf in jax.tree_util.tree_leaves(tree):
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
            ok = ok & jnp.isfinite(leaf).all()
    return ok


def finite_or_skip_step(step_fn: Callable) -> Callable:
    """Wrap a ``(state, *batch) -> (state, loss)`` train step: if gradients
    produce a non-finite new state, keep the old state and return loss=NaN as
    the skip marker. The wrapped step stays a single jittable function.

    The inner step must NOT donate its state argument (the guard re-reads
    it); build with ``make_denoise_train_step(..., donate=False)`` and donate
    at the outer jit instead, where XLA sees both uses."""

    @functools.wraps(step_fn)
    def wrapper(state, *args, **kwargs):
        new_state, loss = step_fn(state, *args, **kwargs)
        ok = (
            tree_all_finite(new_state.params)
            & tree_all_finite(getattr(new_state, "opt_state", ()))
            & jnp.isfinite(loss)
        )
        keep = lambda new, old: jax.tree.map(
            lambda a, b: jnp.where(ok, a, b), new, old
        )
        out_state = keep(new_state, state)
        return out_state, jnp.where(ok, loss, jnp.nan)

    return wrapper
