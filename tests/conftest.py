"""Test configuration: run JAX on a virtual 8-device CPU mesh with x64.

Multi-chip sharding is validated on virtual CPU devices
(``xla_force_host_platform_device_count``); numerical parity tests use
float64, matching the reference's C++ doubles.
"""

import os

# Force CPU: the ambient environment may export JAX_PLATFORMS=axon (the real
# TPU tunnel), which is slow to compile against and float32-only. Tests use
# the virtual 8-device CPU mesh and float64 for numerical parity with the
# reference's C++ doubles.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_enable_x64", True)

import pathlib

import pytest

REFERENCE = pathlib.Path("/root/reference")


@pytest.fixture(scope="session")
def reference_dir() -> pathlib.Path:
    return REFERENCE


@pytest.fixture(scope="session")
def arch_dir() -> pathlib.Path:
    return REFERENCE / "arch"


@pytest.fixture(scope="session")
def snn_dir() -> pathlib.Path:
    return REFERENCE / "snn"
