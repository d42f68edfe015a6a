"""Test setup: run the whole suite on a virtual 8-device CPU mesh.

Multi-chip hardware isn't available in CI, so sharding tests use
``--xla_force_host_platform_device_count=8`` on the CPU backend (SURVEY §4's
"exceed the reference" test plan).
"""

import os

# SATFLOW_TPU_SMOKE=1 keeps the ambient (TPU) backend so test_tpu_smoke.py
# can actually reach the chip: SATFLOW_TPU_SMOKE=1 pytest tests/test_tpu_smoke.py
_TPU_SMOKE = os.environ.get("SATFLOW_TPU_SMOKE") == "1"
if not _TPU_SMOKE:
    os.environ["JAX_PLATFORMS"] = "cpu"
    xla_flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in xla_flags:
        os.environ["XLA_FLAGS"] = (
            xla_flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402

# jaxtyping's pytest plugin imports jax before this conftest runs, so the env
# var alone is too late — override the already-imported config too.
if not _TPU_SMOKE:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)
# Single-core CI hosts: persist compiled executables across test runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/satflow_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def mesh():
    from satflow_tpu.parallel.mesh import get_mesh

    return get_mesh()


@pytest.fixture()
def rng():
    return jax.random.PRNGKey(0)
