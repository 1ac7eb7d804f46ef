"""Test env: force an 8-device virtual CPU mesh before JAX initializes.

The TPU harness registers a remote 'axon' backend in sitecustomize and pins
jax_platforms to it via jax.config (so plain env vars don't win).  Tests must
run on the local CPU backend — eager ops over the TPU tunnel are ~100x wall
clock — with 8 virtual devices so distributed tests (pjit DP, shard_map halo
exchange) can assert 1-vs-N numerical equivalence (SURVEY.md §4).
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

# Must beat the first backend use; overrides the axon plugin's config pin.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(41)


def pytest_sessionstart(session):
    assert jax.default_backend() == "cpu"
    assert jax.device_count() == 8, jax.devices()
