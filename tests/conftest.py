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
# force EXACTLY 8 devices: a pre-existing flag with a different count (e.g. a
# shell that ran trainer=dp_sim) would otherwise silently skip the whole
# multi-device suite via its device-count skipif
flags = [
    f
    for f in os.environ.get("XLA_FLAGS", "").split()
    if "xla_force_host_platform_device_count" not in f
]
flags.append("--xla_force_host_platform_device_count=8")
os.environ["XLA_FLAGS"] = " ".join(flags)

# tests that reach apply_extras / the CLI bootstraps would enable the
# persistent compilation cache at its ~/.cache default; confine the whole
# suite's cache writes to a throwaway dir instead
import tempfile

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", tempfile.mkdtemp(prefix="anomalyclip_xla_cache_")
)

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
