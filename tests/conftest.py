"""Test configuration.

Tests run on a virtual 8-device CPU mesh so sharded code paths compile and
execute without TPU hardware (the real TPU is exercised by bench.py).
"""
import os

# Must be set before jax initializes a backend. NB the session
# environment presets JAX_PLATFORMS=axon (tunneled TPU) and the axon
# sitecustomize registers its plugin at interpreter start, overriding
# JAX_PLATFORMS — so the env alone is NOT enough; jax.config.update
# below is the authoritative override. Tests run on the virtual
# 8-device CPU mesh (the real TPU is exercised by bench.py and the
# verify recipe).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

REFERENCE = "/root/reference"


@pytest.fixture(scope="session")
def reference_dir():
    return REFERENCE


@pytest.fixture(scope="session")
def roundtrip_dir():
    return os.path.join(REFERENCE, "share", "test-data", "round-trip-genotyping")
