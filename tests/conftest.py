"""Test configuration: run JAX on CPU with 8 virtual devices.

This is the TPU-native analogue of "test multi-node without a cluster": all
sharding tests run on a virtual 8-device CPU mesh
(SURVEY.md section 4 — the reference has no tests at all; we build the pyramid).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # the image sets JAX_PLATFORMS=axon (TPU)
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
