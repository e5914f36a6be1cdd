"""Test configuration: force CPU with 8 virtual devices so sharding tests run
without a TPU slice (SURVEY §4: the standard way to test shard_map
collectives)."""

import os

# The container exports JAX_PLATFORMS=axon (remote TPU tunnel); tests must
# run on local CPU — override, don't setdefault.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import pytest  # noqa: E402

ASSETS = "/root/reference/assets"


@pytest.fixture(scope="session")
def assets_dir():
    return ASSETS
