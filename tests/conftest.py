"""Test configuration: force an 8-device virtual CPU platform.

Multi-chip hardware is not available in CI; shardings are validated on a
virtual CPU mesh exactly as the driver's dryrun does.  Must run before jax
initializes, hence the env mutation at import time.
"""

import os

# Force CPU: the ambient environment may point JAX_PLATFORMS at real TPU
# hardware (e.g. an axon tunnel), which would route every test op through it.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import random

import jax
import pytest

# Belt and braces: even if jax was imported before this conftest (e.g. by a
# pytest plugin), force the platform choice at config level.
jax.config.update("jax_platforms", "cpu")


@pytest.fixture
def rng():
    return random.Random(0xF0F0)
