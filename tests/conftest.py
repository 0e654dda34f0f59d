"""Test configuration: run everything on CPU with 8 virtual devices.

The reference's distributed tests require 2 physical GPUs
(test/test_dist_matrix.cpp); we instead exploit JAX's host-platform device
simulation so the full multi-chip sharding path is exercised on any machine
(SURVEY.md §4 'implication for the TPU build').
"""

import os

# Force CPU regardless of the ambient platform (the session environment sets
# JAX_PLATFORMS=axon for the tunneled TPU; tests must be fast + deterministic).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon sitecustomize force-registers the TPU backend and sets
# jax_platforms="axon,cpu" regardless of the env var; override via config.
jax.config.update("jax_platforms", "cpu")

# Parity tests compare against float32 references; keep matmuls in f32.
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_DATA = "/root/reference/test/data"


@pytest.fixture(scope="session")
def toy_dirs():
    if not os.path.isdir(REFERENCE_DATA):
        pytest.skip("reference toy data not available")
    return {
        "toyA": os.path.join(REFERENCE_DATA, "toyA"),
        "toyB": os.path.join(REFERENCE_DATA, "toyB"),
    }


def assert_close_ref(actual, expected, tol=1e-4):
    """The reference's ASSERT_CLOSE: |log2(x) - log2(y)| <= 1e-4, i.e. a
    relative tolerance (test/test.hpp:6-46)."""
    actual = np.asarray(actual, dtype=np.float64).ravel()
    expected = np.asarray(expected, dtype=np.float64).ravel()
    assert actual.shape == expected.shape
    ratio = np.abs(np.log2(np.abs(actual)) - np.log2(np.abs(expected)))
    same_sign = np.sign(actual) == np.sign(expected)
    assert np.all(same_sign), f"sign mismatch: {actual} vs {expected}"
    assert np.all(ratio <= tol), f"rel err {ratio.max()}: {actual} vs {expected}"


@pytest.fixture
def ref_close():
    return assert_close_ref
