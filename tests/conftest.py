"""Test config: force an 8-device virtual CPU mesh.

The axon sitecustomize registers the TPU plugin and forces
``jax_platforms=axon,cpu``; tests override to plain CPU with 8 virtual
devices so distributed tests run without hardware (SURVEY.md §4 test plan).
Must run before any backend is initialised.
"""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402
import numpy as np  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)


@pytest.fixture(scope="session", autouse=True)
def _assert_cpu():
    assert jax.default_backend() == "cpu"
    assert len(jax.devices()) == 8


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "heavy: slow parity/integration tests. Fast CI lane: "
        "pytest -m 'not heavy' (~2-3 min); full lane: plain pytest.")
