"""Test bootstrap: force an 8-device virtual CPU mesh before JAX initializes.

Multi-chip sharding is validated on a host-platform mesh
(``--xla_force_host_platform_device_count=8``) because only one real TPU chip
is reachable in this environment; benches run on the real chip separately.
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
if "--xla_force_host_platform_device_count" not in os.environ["XLA_FLAGS"]:
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

# The axon TPU plugin (sitecustomize) overrides jax_platforms at import; force
# CPU back for hermetic, multi-device tests.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)

# Persistent compile cache: this is a 1-CPU machine and XLA compiles dominate
# suite runtime; repeated runs (CI, the driver) hit the cache and run in a
# fraction of the cold time.
from pathlib import Path

jax.config.update("jax_compilation_cache_dir",
                  str(Path(__file__).resolve().parent.parent / ".jax_cache_cpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np
import pytest


@pytest.fixture(scope="session")
def devices():
    devs = jax.devices()
    assert len(devs) == 8, f"expected 8 virtual CPU devices, got {devs}"
    return devs


@pytest.fixture()
def rng():
    return np.random.default_rng(0)
