"""Test configuration.

Tests run on a virtual 8-device CPU mesh so that all sharding / collective code
paths are exercised without multi-chip TPU hardware (the driver validates the
real multi-chip path separately via __graft_entry__.dryrun_multichip).

x64 is enabled: QMC correctness tests (finite-difference derivative checks,
Madelung constants, SCF references) need double precision; the TPU production
path runs f32/c64 with its own stabilization (see pyqmc_tpu.utils.dtypes).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
os.environ.setdefault("OMP_NUM_THREADS", "4")

import jax

# The sandbox may pre-set JAX_PLATFORMS to the TPU plugin; the env var alone
# is not always honored, so force the platform through the config as well.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(20260816)
