"""Test configuration: force an 8-device CPU mesh before JAX initializes.

This is the TPU-world analogue of the reference's ddp_spawn-on-CPU simulation
(reference: configs/trainer/ddp_sim.yaml, tests/test_train.py:51-60): multi-chip
sharding is exercised on virtual host-platform devices.
"""

import os

# The harness exports JAX_PLATFORMS=axon and pre-imports jax via sitecustomize, so
# plain env vars are too late: force the platform through jax.config (effective
# because no backend has initialized yet) and set the flag with an override.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
