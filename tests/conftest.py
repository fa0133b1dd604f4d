"""Test configuration: force CPU backend with 8 virtual devices.

Multi-chip hardware is not available in this environment; sharding tests run
against an 8-device virtual CPU mesh, which exercises the same pjit/shard_map
partitioning XLA would compile for a real TPU slice.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
