"""Host-fingerprinted XLA:CPU compilation-cache directory.

XLA:CPU persistent-cache entries embed the COMPILE machine's target
features (including XLA-internal tuning flags like prefer-no-scatter that
cpuinfo does not expose); this container migrates across machine types,
and loading a foreign entry can SIGILL (tests/conftest.py history). CPU
runs therefore use a directory keyed by a cpuinfo fingerprint — model
name + flags — and must NEVER point at /root/.jax_cache (the TPU cache).
"""

from __future__ import annotations

import hashlib
import os


def cpu_cache_dir() -> str:
    model, flags = "", ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if not model and line.startswith("model name"):
                    model = line.strip()
                elif not flags and line.startswith("flags"):
                    flags = line.strip()
                if model and flags:
                    break
    except OSError:
        pass
    h = hashlib.sha1((model + "|" + flags).encode()).hexdigest()[:10]
    return "/root/.jax_cache_cpu_" + h


def configure_cpu_cache() -> str:
    """Point the in-process JAX config + env at the fingerprinted dir
    (call before first device use, after forcing the CPU platform)."""
    d = cpu_cache_dir()
    os.environ["JAX_COMPILATION_CACHE_DIR"] = d
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir", d)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass
    return d
