"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip hardware is unavailable in CI, so sharding/pjit tests run against
XLA's host platform with 8 forced devices. Must run before jax is imported.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# The axon TPU plugin's sitecustomize forces jax_platforms="axon,cpu" at
# interpreter start; flip it back before any backend is initialized so tests
# run on the virtual 8-device CPU mesh, not the (single, remote) TPU chip.
jax.config.update("jax_platforms", "cpu")

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pytest


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running test (full-size parity, subprocess)")


@pytest.fixture
def rng():
    return np.random.default_rng(0)


REFERENCE_BACKEND = "/root/reference/backend"


def load_reference_module(name: str):
    """Import a module from the read-only reference for behavioral cross-checks."""
    import importlib.util

    path = os.path.join(REFERENCE_BACKEND, f"{name}.py")
    spec = importlib.util.spec_from_file_location(f"reference_{name}", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod
