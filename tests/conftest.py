"""Test harness: force CPU platform with 8 virtual devices so multi-chip
sharding tests run anywhere (real TPU benchmarking happens in bench.py)."""
import os

os.environ["JAX_PLATFORMS"] = "cpu"  # hard override: the session env presets a TPU platform
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
