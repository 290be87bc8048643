"""Test environment: force the JAX CPU backend with 8 virtual devices so
multi-chip sharding is exercised without TPU hardware (SURVEY.md §4: the
reference has no tests at all; we add unit + property + emulated-mesh tests).

Must run before any test module imports jax. The axon site config pins
JAX_PLATFORMS, so the config update after import is the authoritative
override.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# NOTE: do NOT enable jax_compilation_cache_dir here — writing the cache
# entry for the large interpret-mode Pallas executables segfaults this
# jaxlib (zstd serialization crash in compilation_cache.put_executable).
