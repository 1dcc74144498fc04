"""Test configuration: force an 8-device virtual CPU mesh before JAX loads.

This is the JAX analog of multi-node testing without a cluster (SURVEY.md §4):
sharding/pjit tests run against 8 virtual CPU devices.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# The axon sitecustomize imports jax at interpreter startup with
# JAX_PLATFORMS=axon baked into jax.config, so the env var is already
# consumed — jax.config.update is the only reliable way to force the
# virtual-CPU test platform.
jax.config.update("jax_platforms",
                  os.environ.get("VALUES_TEST_PLATFORM", "cpu"))

# Compilation in this environment goes through a remote compile service
# (~seconds of wall per jit); the persistent cache makes reruns cheap.
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


@pytest.fixture
def rng():
    return np.random.RandomState(0)
