"""Test env: force an 8-device virtual CPU mesh before JAX initializes.

Distributed tests (pjit DP, shard_map halo exchange) run on
xla_force_host_platform_device_count=8, per the multi-chip test strategy
(SURVEY.md §4): 1-device vs N-device numerical equivalence on CPU stands in
for a real pod slice.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(41)
