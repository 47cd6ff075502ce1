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

# The limb-arithmetic kernels trace to large HLO graphs; persistent
# compilation caching makes repeated test runs cheap.
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_test_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
# XLA:CPU AOT bundles in cache entries are machine-feature-specific and
# their loader has crashed (segfault) on large entries; cache the plain
# executables only.
try:
    jax.config.update("jax_persistent_cache_enable_xla_caches", "none")
except Exception:
    pass


@pytest.fixture
def rng():
    return random.Random(0xF0F0)
