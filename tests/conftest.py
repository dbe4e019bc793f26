"""Test configuration: force the CPU backend with 8 virtual devices so
single-chip tests and multi-chip sharding tests run anywhere (SURVEY.md §4).

Note: the runtime image pre-imports jax with a TPU plugin via sitecustomize,
so env vars alone are too late — `jax.config.update` switches the platform
before any backend is initialized, and XLA_FLAGS (read at backend init) adds
the 8 virtual CPU devices for the sharding tests.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(0)
