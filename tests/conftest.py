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
# Use a machine-local XLA compile cache: the default shared cache can hold
# executables compiled on hosts with different CPU features (see the
# cpu_aot_loader machine-feature warnings), and deserializing those can
# SIGILL/segfault mid-suite. A dir this host populates itself is safe and
# keeps repeat suite runs fast.
jax.config.update(
    "jax_compilation_cache_dir", "/tmp/exllama_tpu_test_xla_cache"
)

import pytest  # noqa: E402


@pytest.fixture(scope="session", autouse=True)
def _assert_cpu_devices():
    devs = jax.devices()
    assert devs[0].platform == "cpu", f"tests require CPU backend, got {devs}"
    assert len(devs) == 8, f"expected 8 virtual CPU devices, got {len(devs)}"
    yield
