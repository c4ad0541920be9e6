"""Pytest configuration: run all tests on a virtual 8-device CPU mesh.

Multi-chip sharding (parallel/) is validated on
``--xla_force_host_platform_device_count=8`` CPU devices, mirroring how the
driver dry-runs the multi-chip path; single-device numerics tests run on
CPU device 0. Real-TPU performance is measured by bench.py, not here.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# The axon TPU plugin (sitecustomize) pins jax_platforms at interpreter
# start; the config update below takes precedence over its env pinning and
# routes the whole test session to the virtual-CPU backend.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
