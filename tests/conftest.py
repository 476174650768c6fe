"""Test configuration: force an 8-device virtual CPU mesh so sharding code paths are
exercised without TPU hardware (SURVEY.md §4 test-strategy note)."""

import os

# The image exports JAX_PLATFORMS=axon (a tunneled real TPU) and a sitecustomize that
# imports jax at interpreter startup, so plain env vars are read too late — override via
# jax.config. Tests run on a local 8-device virtual CPU mesh: fast, deterministic, and
# exercises the same shard_map code paths as a real pod slice.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax

jax.config.update("jax_platforms", "cpu")
# Numeric tests assume true f32 matmuls (TPU would default to bf16 passes on the MXU).
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np
import pytest


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running test (runs by default; deselect with -m 'not slow')")


@pytest.fixture
def rng():
    return np.random.default_rng(8214)  # reference's seed (vo_stereo_runner.py:20-24)
