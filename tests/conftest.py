"""Test configuration: force CPU with 8 virtual devices so sharding tests run
without a TPU slice (SURVEY §4: the standard way to test shard_map
collectives)."""

import os

# The container exports JAX_PLATFORMS=axon (remote TPU tunnel); tests must
# run on local CPU — override, don't setdefault.
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

# The axon sitecustomize registers the TPU tunnel and programmatically sets
# jax_platforms=axon, overriding the env var — override it back, and give
# shard_map tests 8 virtual CPU devices (jax>=0.9 config API; the old
# --xla_force_host_platform_device_count XLA flag no longer works).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import pytest  # noqa: E402

ASSETS = "/root/reference/assets"


@pytest.fixture(scope="session")
def assets_dir():
    return ASSETS
