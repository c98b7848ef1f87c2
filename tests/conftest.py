"""Test harness: run everything on a virtual 8-device CPU mesh.

Mirrors SURVEY.md §4's implication: the reference has no unit tests, so we
build the pyramid ourselves — kernel unit tests against closed forms,
module tests on synthetic scenes, and sharding tests emulated with
``--xla_force_host_platform_device_count=8`` (no TPU needed in CI).
"""

import os

# Must be set before jax is imported anywhere.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
