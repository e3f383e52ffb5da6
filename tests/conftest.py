"""Test configuration: run on a virtual 8-device CPU mesh with x64 enabled.

Multi-chip sharding is validated on host CPU devices
(``--xla_force_host_platform_device_count``); the real-chip path is
exercised by ``bench.py`` and the driver's dryrun.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax

# The environment presets JAX_PLATFORMS=axon (TPU tunnel) and a site hook can
# re-apply it after our env override, so force the CPU platform via config too.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
