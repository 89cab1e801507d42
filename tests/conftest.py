"""Test configuration: CPU backend with 8 virtual devices (so mesh/collective
tests run without a pod), float64 enabled (the reference pins
torch.set_default_dtype(torch.float64) and asserts equivariance at atol 1e-6 —
tests/test_equivariance.py:6).

NOTE: this environment's sitecustomize imports jax at interpreter startup with
JAX_PLATFORMS=axon (TPU tunnel) already latched, so env vars set here are too
late — ``jax.config.update("jax_platforms", ...)`` is the only reliable
override. XLA_FLAGS is still read lazily at first backend init, so the
virtual-device flag does work from here.
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Per-op dispatch/compile is slow in this environment; a persistent
# compilation cache makes repeat suite runs fast.
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def pytest_sessionstart(session):
    devs = jax.devices()
    assert devs[0].platform == "cpu", f"tests must run on CPU, got {devs}"
    assert len(devs) == 8, f"expected 8 virtual CPU devices, got {len(devs)}"
