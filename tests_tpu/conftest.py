"""TPU-side smoke-suite configuration (SURVEY §7 hard-part 5).

Unlike tests/ (which forces CPU + f64 for exact reference parity), this lane
runs ON THE REAL CHIP: f32, bf16 MXU matmul passes, Mosaic-compiled kernels.
It exists to catch Mosaic lowering bugs that interpret-mode parity cannot see
(CLAUDE.md lists seven such gotchas hit during development).

Run (documented in README): python -m pytest tests_tpu/ -q
The whole suite SKIPS unless the attached backend is a TPU, so it is safe in
CI/CPU environments. First run compiles ~15 programs (~20-40 s each on the
tunnel); the persistent cache makes repeats fast.
"""
import jax
import pytest

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def pytest_collection_modifyitems(config, items):
    if jax.default_backend() != "tpu":
        skip = pytest.mark.skip(reason="TPU smoke suite: no TPU backend attached")
        for item in items:
            item.add_marker(skip)
