"""Test configuration: force the JAX CPU backend with 8 virtual devices.

Tests must run without TPU hardware; sharding tests use an 8-device virtual
CPU mesh. This must execute before any test module initializes a JAX backend.
"""

import os

# Must be set before jax initializes its backends. The axon TPU plugin (if
# present in this image) registers itself via sitecustomize and pins
# JAX_PLATFORMS; jax.config.update below overrides the platform selection as
# long as no backend has been initialized yet.
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
if "--xla_force_host_platform_device_count" not in os.environ["XLA_FLAGS"]:
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# NO persistent XLA cache on the CPU backend: round-5 observed segfaults in
# BOTH cache directions mid-suite — deserializing entries written by a
# differently-featured host (cpu_aot_loader machine-mismatch → SIGILL) and
# serializing multi-device shard_map executables (put_executable_and_time
# SEGV). utils/compile_cache.py applies the same policy for any process on
# the cpu platform; the env override below keeps the package init from
# re-enabling it.
os.environ.setdefault("EXLLAMA_TPU_CACHE_DIR", "off")

import pytest  # noqa: E402


@pytest.fixture(scope="session", autouse=True)
def _assert_cpu_devices():
    devs = jax.devices()
    assert devs[0].platform == "cpu", f"tests require CPU backend, got {devs}"
    assert len(devs) == 8, f"expected 8 virtual CPU devices, got {len(devs)}"
    yield
