"""Test configuration: force an 8-device virtual CPU mesh.

The container's sitecustomize (axon TPU tunnel) imports jax at interpreter
startup and pins JAX_PLATFORMS=axon, so env vars set here are too late —
but `jax.config.update` still wins as long as no backend has been created.
XLA_FLAGS is read lazily at CPU-backend creation, so setting it here works.
Tests must never land on the real chip (slow remote compiles, single
device, different fp paths).
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.local_device_count() == 8, (
    f"tests need the 8-device virtual CPU mesh, got {jax.devices()}")


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches():
    """Free compiled executables between test modules: the CPU XLA
    backend has been observed to segfault in backend_compile_and_load
    deep into the suite (accumulated compilation state), while every
    module passes standalone."""
    yield
    jax.clear_caches()
