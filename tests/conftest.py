"""Test configuration: run JAX on CPU with 8 virtual devices.

This is the TPU-native analogue of "test multi-node without a cluster": all
sharding tests run on a virtual 8-device CPU mesh
(SURVEY.md section 4 — the reference has no tests at all; we build the pyramid).

NOTE: the TPU image's sitecustomize imports jax at interpreter start and
pins JAX_PLATFORMS=axon, so setting the env var here is too late — we must
use jax.config.update *after* import (backends are only initialized on first
use, so this still wins). Without this, every test silently runs over the
single tunneled TPU chip and deadlocks against concurrent TPU jobs.
"""

import os

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"  # effective only if jax not imported yet

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

assert jax.default_backend() == "cpu", (
    f"tests must run on CPU, got {jax.default_backend()}")
assert len(jax.devices()) >= 8, "virtual 8-device CPU mesh not active"

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
