"""Test configuration: run JAX on a virtual 8-device CPU mesh with x64.

Multi-chip sharding is validated on virtual CPU devices
(``xla_force_host_platform_device_count``); numerical parity tests use
float64, matching the reference's C++ doubles.
"""

import jax

# Force CPU with a virtual 8-device mesh and float64 (numerical parity with
# the reference's C++ doubles). Env vars are NOT sufficient here: the
# environment may inject a TPU PJRT plugin via sitecustomize, importing jax
# before any test code runs, so the platform and device count must be set
# through jax.config (jax>=0.9 replaced --xla_force_host_platform_device_count
# with jax_num_cpu_devices).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
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
