"""Test harness: force an 8-device virtual CPU platform before jax imports.

Multi-chip sharding logic is validated on a virtual mesh
(xla_force_host_platform_device_count), Pallas kernels run in interpret mode
on CPU — no TPU required for CI.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("GSSR_TPU_INTERPRET", "1")  # pallas interpret mode

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
