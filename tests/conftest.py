"""Test configuration: force an 8-device CPU mesh so multi-chip sharding
logic (client shards, distributed BA collectives) is exercised hermetically on
one machine — the TPU-native analog of the reference's
roscore-on-localhost multi-process testing (ref: README.md:55-75)."""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The container's axon sitecustomize pins JAX_PLATFORMS=axon (real TPU);
# tests must run hermetically on the 8-device virtual CPU mesh.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)

# CPU-only cache dir: entries written by axon/TPU-host sessions carry
# different machine-feature sets and poison pure-CPU executions (XLA's
# cpu_aot_loader feature-mismatch warnings + wrong numerics), so tests
# never share a cache with bench/TPU runs.
os.environ["JAX_COMPILATION_CACHE_DIR"] = "/root/.jax_cache_cpu"
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
