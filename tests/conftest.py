"""Test harness: run everything on an 8-device virtual CPU mesh.

Multi-chip hardware isn't available in CI, so sharding/collective paths are
validated on XLA's host-platform device simulation — the TPU-world
substitute for distributed tests (SURVEY.md §4).

Env vars must be set before jax initializes, hence at conftest import time.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The CI image's sitecustomize force-registers a TPU plugin; override it —
# tests run on the virtual 8-device CPU platform.
jax.config.update("jax_platforms", "cpu")

import numpy as onp  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return onp.random.default_rng(2018)
