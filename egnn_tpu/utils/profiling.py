"""Tracing, timing and roofline accounting (SURVEY.md §5.1).

The reference has no profiling machinery (ad-hoc ``time.time()`` in its
notebook only); a perf-first TPU framework needs it as a subsystem:

- ``trace(logdir)``     — context manager around ``jax.profiler`` producing
                          Perfetto/XPlane dumps viewable in XProf/TensorBoard.
- ``annotate(name)``    — ``jax.named_scope`` alias; the models use it so HLO
                          and profiles carry layer names.
- ``time_fn``           — robust wall timing for jitted callables. Two traps
                          on remote-TPU (tunnel) runtimes that this helper
                          avoids, learned the hard way:
                          (1) ``block_until_ready`` can return before remote
                              execution finishes — only a device->host fetch
                              forces it;
                          (2) repeat executions with bit-identical inputs can
                              be served from a replay cache — every timed call
                              must use distinct inputs.
- ``Roofline``          — peak-rate bookkeeping: achieved FLOP/s and B/s vs
                          chip peaks (defaults: TPU v5e single chip).
"""
from __future__ import annotations

import contextlib
import dataclasses
import time
from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp

annotate = jax.named_scope


@contextlib.contextmanager
def trace(logdir: str, create_perfetto_link: bool = False):
    """Profile everything in the block into ``logdir`` (XPlane + Perfetto)."""
    jax.profiler.start_trace(logdir, create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def _force_fetch(out: Any) -> float:
    """Device->host fetch of a scalar reduction over every output leaf —
    the only reliable execution barrier on remote-TPU runtimes."""
    leaves = [x for x in jax.tree_util.tree_leaves(out) if hasattr(x, "dtype")]
    s = sum(jnp.sum(jnp.abs(x.astype(jnp.float32))) for x in leaves)
    return float(s)


def time_fn(
    fn: Callable,
    make_args: Callable[[int], tuple],
    reps: int = 3,
    warmup: int = 1,
) -> float:
    """Best-of-``reps`` wall seconds for one ``fn(*args)`` call.

    ``make_args(i)`` must return a DISTINCT argument tuple per index (replay
    caches key on input bits). The fetch of the output is inside the timed
    region; subtract nothing — for kernel-scale timings wrap ``fn`` so one
    call runs the kernel many times with a data dependency.
    """
    for i in range(warmup):
        _force_fetch(fn(*make_args(-1 - i)))
    best = float("inf")
    for i in range(reps):
        args = make_args(i)
        t0 = time.perf_counter()
        _force_fetch(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def chain_calls(fn: Callable, n: int) -> Callable:
    """Wrap ``fn(x) -> y`` into one jitted call running it ``n`` times with a
    data dependency between iterations (the perturbation keeps inputs distinct
    so nothing can be CSE'd or replayed). Uses ``fori_loop`` so compile time
    is independent of ``n``. Divide the measured time by ``n``."""

    def body(i, x):
        y = fn(x)
        leaves = [l for l in jax.tree_util.tree_leaves(y) if hasattr(l, "dtype")]
        bump = sum(jnp.sum(jnp.abs(l.astype(x.dtype))) for l in leaves)
        return x + bump * jnp.asarray(1e-12, x.dtype)

    @jax.jit
    def many(x):
        return jax.lax.fori_loop(0, n, body, x)

    return many


def measure_op(
    fn: Callable,
    x,
    reps_lo: int = 200,
    reps_hi: int = 1000,
    reps_outer: int = 4,
) -> float:
    """Seconds per ``fn(x)`` call, free of fixed dispatch overhead.

    Remote-TPU runtimes cost tens of MILLISECONDS per program dispatch+fetch,
    swamping microsecond kernels; timing one chained program mismeasures by
    overhead/n. This times chains of ``reps_lo`` and ``reps_hi`` iterations
    and returns the slope (T_hi - T_lo) / (reps_hi - reps_lo), cancelling the
    fixed cost exactly.
    """
    f_lo = chain_calls(fn, reps_lo)
    f_hi = chain_calls(fn, reps_hi)
    t_lo = time_fn(f_lo, lambda i: (x * (1.0 + 1e-4 * (i + 2)),), reps=reps_outer)
    t_hi = time_fn(f_hi, lambda i: (x * (1.0 + 1e-4 * (i + 2)),), reps=reps_outer)
    return max(t_hi - t_lo, 1e-12) / (reps_hi - reps_lo)


@dataclasses.dataclass(frozen=True)
class Roofline:
    """Achieved-vs-peak accounting for one measured op."""

    name: str
    seconds: float
    flops: float = 0.0
    bytes_accessed: float = 0.0
    # TPU v5e single-chip peaks: 197 TFLOP/s bf16 (f32 via MXU passes is
    # lower), 819 GB/s HBM.
    peak_flops: float = 197e12
    peak_bw: float = 819e9

    @property
    def achieved_flops(self) -> float:
        return self.flops / self.seconds if self.seconds else 0.0

    @property
    def achieved_bw(self) -> float:
        return self.bytes_accessed / self.seconds if self.seconds else 0.0

    @property
    def compute_fraction(self) -> float:
        return self.achieved_flops / self.peak_flops

    @property
    def bandwidth_fraction(self) -> float:
        return self.achieved_bw / self.peak_bw

    @property
    def bound(self) -> str:
        """Which roofline the op is closer to."""
        return "compute" if self.compute_fraction >= self.bandwidth_fraction else "memory"

    def report(self) -> str:
        return (
            f"{self.name}: {self.seconds*1e6:.1f} us | "
            f"{self.achieved_flops/1e12:.2f} TFLOP/s ({self.compute_fraction:.1%} peak) | "
            f"{self.achieved_bw/1e9:.1f} GB/s ({self.bandwidth_fraction:.1%} peak) | "
            f"{self.bound}-bound"
        )
