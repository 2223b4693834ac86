"""Test configuration: force CPU backend with 8 virtual devices.

The environment registers a TPU ('axon') PJRT plugin via sitecustomize and pins
``JAX_PLATFORMS=axon``; tests must run on the host CPU with a virtual 8-device mesh,
so we override the platform through jax.config *after* import (env vars alone are
overridden by the plugin) and set the host-device-count flag before backend init.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
