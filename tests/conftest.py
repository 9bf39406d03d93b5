"""Test env: force CPU jax with 8 virtual devices (multi-chip sharding tests
run on a virtual mesh; real-TPU perf is exercised by bench.py, not pytest)."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_ENABLE_X64", "0")
# XLA-CPU's default matmul precision is bf16-like (~5e-2 abs error on unit-
# scale fp32 inputs) — force full fp32 so golden tests compare real numerics.
import jax  # noqa: E402  (env vars above must be set before this import)

# The preinstalled 'axon' TPU plugin overrides the JAX_PLATFORMS env var;
# config.update is authoritative. Without this, "CPU" tests silently run on
# the real TPU chip.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import gc  # noqa: E402

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _drop_compiled_programs():
    """Release each module's compiled executables when it finishes.

    The suite compiles hundreds of large while-loop programs; with all of
    them held live, XLA-CPU's compiler segfaults non-deterministically
    ~140 tests in (observed at 44% and 88% on different runs). Per-module
    eviction keeps within-module caching (the expensive repeated programs
    are intra-module) while bounding process-lifetime compiler state."""
    yield
    jax.clear_caches()
    gc.collect()


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "quick: fast correctness tier (<3 min total; losslessness on tiny "
        "shapes, finalize_tree, calibrator goldens, task scoring rules) — "
        "run with `pytest -m quick` for tight driver iterations")
