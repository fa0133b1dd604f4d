"""Test configuration: force CPU backend with 8 virtual devices.

Multi-chip hardware is not available in this environment; sharding tests run
against an 8-device virtual CPU mesh, which exercises the same pjit/GSPMD
partitioning XLA would compile for a real TPU slice.

Note: the ambient environment registers the TPU plugin from sitecustomize at
interpreter startup (jax is already imported before pytest loads this file),
so plain env-var settings are too late — the platform must be overridden via
jax.config, and the XLA flag before the first backend initialization.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# TUATARA_TEST_TPU=1 keeps the ambient TPU backend (runs the TPU-gated
# Pallas lowering tests on real hardware instead of skipping them).
if not os.environ.get("TUATARA_TEST_TPU"):
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
