"""Test harness: force an 8-device virtual CPU platform before jax imports.

Multi-chip sharding logic is validated on a virtual mesh
(xla_force_host_platform_device_count), Pallas kernels run in interpret mode
on CPU — no TPU required for CI.
"""
import os

# force, don't setdefault: the machine environment exports
# JAX_PLATFORMS=axon (the remote TPU tunnel) globally, and tests must
# never compete with training/bench jobs for the single TPU client slot
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("GSSR_TPU_INTERPRET", "1")  # pallas interpret mode

# the machine's sitecustomize registers the axon TPU plugin at interpreter
# startup (before this file runs), which pins the platform choice — the
# config update below overrides it again
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
