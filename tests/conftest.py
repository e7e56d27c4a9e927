"""Test harness: force CPU platform with 8 virtual devices so multi-chip
sharding tests run anywhere (real TPU benchmarking happens in bench.py).

NOTE: this image's sitecustomize pre-imports jax and registers the TPU
backend in every python process, so env-var tricks are too late here —
we must go through jax.config. XLA_FLAGS still works because the CPU
client is only created on first use.
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compilation cache: grad-of-convnet compiles take minutes on the
# CPU backend; cache them across test runs
_cache_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# a stale experiment knob in the invoking shell (CONTROLVAR_INV_DECODE=1,
# CONTROLVAR_ABLATE, ...) would silently reroute every decode test; strip
# them all once at session start (tests that exercise a knob set it
# explicitly via monkeypatch)
from controlvar_tpu.config import EXPERIMENT_ENV_KNOBS  # noqa: E402

for _k in EXPERIMENT_ENV_KNOBS:
    os.environ.pop(_k, None)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def cpu_mesh_devices():
    devs = jax.devices("cpu")
    assert len(devs) >= 8, f"expected 8 virtual CPU devices, got {len(devs)}"
    return devs
