"""Test configuration: run all tests on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding correctness is
validated on XLA's host-platform virtual devices (same SPMD partitioner).
Must set env vars BEFORE jax is imported anywhere.
"""

import os

# The harness environment pins JAX_PLATFORMS=axon (remote TPU tunnel) and
# pre-imports jax via sitecustomize, so env-var overrides are too late here;
# jax.config.update still works because backends initialize lazily.
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
# Persistent compile cache: the big-field EC/NTT graphs are compile-heavy.
jax.config.update("jax_compilation_cache_dir", "/tmp/zkevm_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0xC0FFEE)
