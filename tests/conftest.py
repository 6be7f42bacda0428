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
# persistent compilation cache at its ~/.cache default (or, with setdefault,
# write suite entries into a developer's real cache dir); unconditionally
# point the suite at a throwaway dir and remove it on exit
import atexit
import shutil
import tempfile

_cache_dir = tempfile.mkdtemp(prefix="anomalyclip_xla_cache_")
os.environ["JAX_COMPILATION_CACHE_DIR"] = _cache_dir
atexit.register(shutil.rmtree, _cache_dir, ignore_errors=True)

# resolve_clip self-bootstraps from the pinned release URLs when no local
# checkpoint exists; the suite must never touch the network (and on a
# zero-egress host would only add a DNS-timeout to every miss)
os.environ["ANOMALYCLIP_NO_DOWNLOAD"] = "1"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
