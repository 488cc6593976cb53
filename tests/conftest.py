"""Test harness: run JAX on a virtual 8-device CPU mesh.

Must run before any other jax usage (pytest imports conftest first).  The
axon TPU plugin force-appends itself to jax_platforms, so the env var alone is
not enough — we also update the config after import.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax

if os.environ.get("JAX_REQUIRE_TPU") == "1":
    # opt-out for real-chip tests (tests/test_tpu_dropout.py)
    assert jax.default_backend() == "tpu", jax.default_backend()
else:
    jax.config.update("jax_platforms", "cpu")
    assert jax.default_backend() == "cpu", jax.default_backend()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
