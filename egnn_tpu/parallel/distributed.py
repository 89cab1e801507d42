"""Multi-host runtime: process-group init, host-0 logging, metrics.

The reference is strictly single-process (SURVEY.md §5.8: no
torch.distributed import anywhere). On TPU pods the communication backend is
the JAX runtime itself; this module wraps the lifecycle pieces around it:

- ``initialize()``            — ``jax.distributed.initialize`` with env
                                auto-detection, idempotent, safe single-host.
- ``is_coordinator()``        — process_index == 0.
- ``log0()``                  — print only on the coordinator (under pjit all
                                hosts run the same program; logs would repeat).
- ``MetricLogger``            — structured JSONL metrics (loss, edges/s,
                                step time), coordinator-only, flush-on-write
                                so a killed run keeps its history (the
                                failure-recovery story is checkpoint+resume,
                                training/checkpoint.py).
- ``sync_global_devices()``   — cross-host barrier for checkpoint fences.
"""
from __future__ import annotations

import json
import os
import time
from typing import Any, Mapping, Optional

import jax


_initialized = False


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Bring up the multi-host process group (idempotent).

    On TPU pods with standard env (TPU_WORKER_HOSTNAMES etc.), bare
    ``initialize()`` auto-detects everything; on single-host it's a no-op.
    Call before any jax computation.
    """
    global _initialized
    if _initialized:
        return
    # NOTE: do NOT probe jax.process_count()/jax.devices() here — that
    # instantiates the local backend, after which distributed.initialize
    # raises ("must be called before backends are initialized") and
    # multi-host init would silently never happen.
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except ValueError:
        # single-process environment: no coordinator configured anywhere
        # (env auto-detection found nothing and none was passed) — fine.
        pass
    except RuntimeError as e:
        msg = str(e).lower()
        if "already" in msg or "initialized" in msg:
            pass  # someone else initialized first — fine
        elif "must be called before" in msg and coordinator_address is None:
            # The local backend is already up (e.g. tests that touched jax
            # before calling us) and no explicit multi-host config was given:
            # treat as single-process. With an explicit coordinator this is a
            # real ordering bug, so re-raise in that case.
            pass
        else:
            raise
    _initialized = True


def is_coordinator() -> bool:
    return jax.process_index() == 0


def log0(*args, **kwargs) -> None:
    """print() on the coordinator host only."""
    if is_coordinator():
        print(*args, **kwargs)


def sync_global_devices(tag: str = "barrier") -> None:
    """Cross-host barrier (e.g. before/after checkpoint writes)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(tag)


class MetricLogger:
    """Append-only JSONL metrics, coordinator-only.

    Host scalars are written (and flushed) immediately, so a killed run keeps
    its history. Device arrays are NOT fetched per call — ``float(device_arr)``
    would block the training thread on every step (the measurement trap
    CLAUDE.md warns about). Instead records holding device values are buffered
    and resolved with one batched ``jax.device_get`` every ``flush_every``
    records (and on ``flush()``/``close()``), so the sync cost is amortized
    ~``flush_every``× and the step loop never stalls on a metric.

    Records wall time and step so post-hoc edges/s / scaling-efficiency
    curves can be derived; pair with utils/profiling.py for device-side
    rooflines.
    """

    def __init__(self, path: Optional[str] = None, flush_every: int = 32):
        self._path = path
        self._f = None
        self._t0 = time.time()
        self._flush_every = max(1, int(flush_every))
        self._pending: list = []  # records still holding device arrays
        if path is not None and is_coordinator():
            os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
            self._f = open(path, "a", buffering=1)

    @staticmethod
    def _is_device(v: Any) -> bool:
        return isinstance(v, jax.Array) and getattr(v, "ndim", 1) == 0

    def log(self, step: int, **metrics: Any) -> Mapping[str, Any]:
        rec: dict = {"step": int(step), "t": round(time.time() - self._t0, 3)}
        deferred = False
        for k, v in metrics.items():
            if self._is_device(v):
                rec[k] = v  # resolved later in one batched device_get
                deferred = True
            else:
                try:
                    rec[k] = float(v)
                except (TypeError, ValueError):
                    rec[k] = v
        if deferred:
            self._pending.append(rec)
            if len(self._pending) >= self._flush_every:
                self.flush()
        elif self._f is not None:
            self._f.write(json.dumps(rec) + "\n")
        return rec

    def flush(self) -> None:
        """Resolve buffered device values (one batched fetch) and write them."""
        if not self._pending:
            return
        pending, self._pending = self._pending, []
        fetched = jax.device_get(pending)  # one sync for the whole buffer
        for rec in fetched:
            for k, v in rec.items():
                if hasattr(v, "item"):
                    rec[k] = float(v)
            if self._f is not None:
                self._f.write(json.dumps(rec) + "\n")

    def close(self) -> None:
        self.flush()
        if self._f is not None:
            self._f.close()
            self._f = None
