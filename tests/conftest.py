"""Test configuration: force a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding correctness is
validated on XLA's host-platform virtual devices (SURVEY.md §4's
recommendation).

Note: this environment preloads jax (sitecustomize registers a remote TPU
backend and sets JAX_PLATFORMS), so the env var alone is too late — we use
jax.config.update, which works because backends are registered but not yet
initialized when conftest runs.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(0)
