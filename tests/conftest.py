"""Test configuration: run all tests on CPU (native float64, fast jit) with a
virtual 8-device mesh so multi-chip sharding is exercised without TPUs.

The dev environment exports JAX_PLATFORMS=axon (tunnelled TPU) and its
plugin ignores the env var, so the platform must be forced via jax.config
before any backend is initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/fvens_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax

jax.config.update("jax_platforms", "cpu")

import pathlib
import pytest

REFERENCE = pathlib.Path("/root/reference")


def reference_available() -> bool:
    return REFERENCE.is_dir()


@pytest.fixture
def refdir():
    if not reference_available():
        pytest.skip("reference mesh data not available")
    return REFERENCE
