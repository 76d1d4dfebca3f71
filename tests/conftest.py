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

import contextlib
import importlib.machinery
import importlib.util
import types


def stub_module(name: str, **attrs):
    """A stand-in for a reference dependency (eel/cmap/decord/...) with a
    real ModuleSpec so importlib.util.find_spec on it doesn't raise."""
    m = types.ModuleType(name)
    m.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    for k, v in attrs.items():
        setattr(m, k, v)
    return m


@contextlib.contextmanager
def load_reference_page(target: str, stubs: dict):
    """Load a reference GUI-page module (backend/<target>.py) for
    differential oracles, with its runtime deps stubbed and the real
    scientific modules (classifier_head, splits, cbas) underneath.

    ``stubs`` maps module names (eel/gui_state/workthreads/cmap/...) to
    stub modules from :func:`stub_module`. sys.modules is restored on exit
    so oracle fixtures can't leak stubs into other tests.
    """
    stubs = dict(stubs)
    if "decord" not in sys.modules:
        stubs.setdefault("decord", stub_module("decord"))

    def _load(name, path):
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        return mod

    names = list(stubs) + [
        "classifier_head", "backend", "backend.splits", "cbas",
        f"ref_{target}",
    ]
    saved = {k: sys.modules.get(k) for k in names}
    try:
        sys.modules.update(stubs)
        _load("classifier_head", os.path.join(REFERENCE_BACKEND, "classifier_head.py"))
        backend_pkg = types.ModuleType("backend")
        backend_pkg.__path__ = [REFERENCE_BACKEND]
        sys.modules["backend"] = backend_pkg
        _load("backend.splits", os.path.join(REFERENCE_BACKEND, "splits.py"))
        _load("cbas", os.path.join(REFERENCE_BACKEND, "cbas.py"))
        yield _load(f"ref_{target}", os.path.join(REFERENCE_BACKEND, f"{target}.py"))
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v
