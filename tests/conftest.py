"""Test configuration.

Tests run on a virtual 8-device CPU mesh so sharded code paths compile and
execute without TPU hardware (the real TPU is exercised by bench.py).
"""
import os

# Must be set before jax is imported anywhere. NB the session environment
# presets JAX_PLATFORMS=axon (tunneled TPU), so this must be a hard
# override, not setdefault — tests run on the virtual CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import pytest  # noqa: E402

REFERENCE = "/root/reference"


@pytest.fixture(scope="session")
def reference_dir():
    return REFERENCE


@pytest.fixture(scope="session")
def roundtrip_dir():
    return os.path.join(REFERENCE, "share", "test-data", "round-trip-genotyping")
