"""Test harness: 8 virtual CPU devices so jax.sharding meshes are
exercised without TPU hardware (the fake-cluster mechanism the reference
lacks — SURVEY.md §4)."""

import os

# Force CPU: the ambient environment registers the axon TPU plugin at
# interpreter start (sitecustomize) and pins jax_platforms="axon,cpu";
# unit tests must run on the 8-device virtual CPU instead, so override
# the config AFTER importing jax (env vars alone are ignored).
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Persistent compilation cache: the suite compiles many distinct kNN /
# scan shapes; caching cuts repeat runs from minutes to seconds.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/ngpd_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
# The suite is XLA-compile-bound on CPU, not runtime-bound: skipping the
# expensive optimization passes cuts cold wall-clock ~25% with tiny test
# shapes (numerical tolerances unaffected — engine-parity tests pass).
os.environ.setdefault("JAX_DISABLE_MOST_OPTIMIZATIONS", "1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
