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

# NO persistent compilation cache for the suite. Two observed failure
# modes make it a liability here: (a) XLA:CPU AOT entries embed the compile
# host's feature set and the container migrates across machine types
# (cpu_aot_loader feature-mismatch warnings, then SIGSEGV on load); (b)
# even same-host, deserializing cached executables into a long-lived
# process that has already loaded 100+ programs segfaulted reproducibly
# (compilation_cache.get_executable_and_time) while the identical tests
# pass in isolation. CPU compiles of these programs are cheap; always
# compiling is deterministic.
jax.config.update("jax_enable_compilation_cache", False)
os.environ.pop("JAX_COMPILATION_CACHE_DIR", None)
