"""Test harness: run everything on a virtual 8-device CPU mesh.

Mirrors SURVEY.md §4's implication: the reference has no unit tests, so we
build the pyramid ourselves — kernel unit tests against closed forms,
module tests on synthetic scenes, and sharding tests emulated on virtual
CPU devices (no TPU needed in CI).

NOTE: this environment pre-sets JAX_PLATFORMS=axon (a tunneled TPU), so
platform selection MUST go through jax.config.update — env vars are
already taken.
"""

import os

os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")  # silence XLA AOT-loader spam

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Persistent compilation cache: repeated test runs reuse executables.
from orbslam3_tpu.utils import enable_compile_cache  # noqa: E402

enable_compile_cache()


@pytest.fixture
def rng():
    return np.random.default_rng(0)
