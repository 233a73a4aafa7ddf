"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated without TPU hardware by forcing the host
platform to expose 8 devices (the TPU answer to "test multi-node without a
cluster" — SURVEY.md §4).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# A sitecustomize may have force-registered a TPU tunnel backend and set
# jax_platforms="axon,cpu"; override back to pure CPU for the test suite.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

# The suite is compile-bound on a 1-core CI host (~16 min cold). The
# persistent cache makes warm reruns skip XLA compilation entirely.
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jaxcache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
