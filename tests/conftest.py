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

import subprocess

import numpy as np
import pytest

# Build the native sim core if it is missing (fresh checkout / cleaned build
# dir). The closed-loop env tests are calibrated against the native backend:
# numpy-vs-native step parity is atol=2e-4 per 20 steps (test_sim), and over
# a full multi-fold rollout that float-op-order divergence compounds
# chaotically — enough to push threshold-tight trajectory assertions over
# the line (seen once as a 0.0389 vs 6*radius=0.0375 failure) — and the
# numpy fallback is ~10x slower. Idempotent: make no-ops when up to date.
_CSRC = Path(__file__).resolve().parent.parent / "csrc"
if (_CSRC / "Makefile").exists():
    subprocess.run(["make", "-C", str(_CSRC)], capture_output=True,
                   timeout=300, check=False)


@pytest.fixture(autouse=True)
def _reset_active_mesh():
    """parallel.set_active_mesh is process-global (Trainer sets it); reset
    after every test so a pp/ep mesh can't leak into unrelated tests."""
    yield
    from bifold_tpu import parallel

    parallel.set_active_mesh(None)


@pytest.fixture(scope="session")
def devices():
    devs = jax.devices()
    assert len(devs) == 8, f"expected 8 virtual CPU devices, got {devs}"
    return devs


@pytest.fixture()
def rng():
    return np.random.default_rng(0)
