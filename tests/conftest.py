"""Test configuration: force an 8-device virtual CPU platform.

Multi-chip hardware is not available in CI; shardings are validated on a
virtual CPU mesh exactly as the driver's dryrun does.  Must run before jax
initializes, hence the env mutation at import time.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import random

import pytest


@pytest.fixture
def rng():
    return random.Random(0xF0F0)
