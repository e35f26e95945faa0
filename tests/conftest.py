"""Test configuration: run JAX on a virtual 8-device CPU mesh with x64.

Multi-chip sharding is validated on virtual CPU devices
(``xla_force_host_platform_device_count``); numerical parity tests use
float64, matching the reference's C++ doubles.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "1")

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
