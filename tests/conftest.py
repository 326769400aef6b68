"""Test configuration.

Tests run on CPU with 8 virtual devices so multi-chip sharding paths
(jax.sharding.Mesh + shard_map) are exercised without TPU hardware,
mirroring the reference's strategy of testing full pipelines at tiny
sector sizes (reference: libs/filecoin/.../constants.hpp:65-78 uses
layers=2/partitions=1/challenges=2 for test sector classes).
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
# The axon TPU-tunnel plugin ignores JAX_PLATFORMS; JAX_PLATFORM_NAME
# does force the cpu client to be the default backend.
os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng_seed():
    # Deterministic seed, analog of the reference's XorShiftRng TEST_SEED
    # (reference: libs/storage/test/core/por.cpp:31).
    return 0x5EED
