"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip hardware is not assumed; sharding tests use
--xla_force_host_platform_device_count (SURVEY.md section 4, multi-host
testing strategy).  The session may pre-register a TPU platform plugin
that ignores the JAX_PLATFORMS env var, so the platform is forced via
jax.config before any backend is initialized.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compilation cache: the tracking scan is expensive to compile
# on CPU; repeat test runs hit the cache
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import hashlib  # noqa: E402

import numpy as np  # noqa: E402

_SYNTH_CACHE = os.path.join(os.path.dirname(__file__), "..", ".synth_cache")


def cached_synth(key: str, builder):
    """Disk-cache synthesized IQ fixtures: the test host has one weak
    burstable core, so second runs must not pay synthesis again."""
    os.makedirs(_SYNTH_CACHE, exist_ok=True)
    h = hashlib.sha1(key.encode()).hexdigest()[:16]
    path = os.path.join(_SYNTH_CACHE, f"{h}.npy")
    if os.path.exists(path):
        return np.load(path)
    data = builder()
    np.save(path, data)
    return data
