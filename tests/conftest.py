"""Test harness: force CPU with 8 virtual devices so multi-chip sharding
(`shard_map`/`psum`) is exercised without TPU hardware. Must run before the
first `import jax` anywhere in the test session."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the host env pins JAX_PLATFORMS=axon (TPU)
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The pytest process may have imported jax before this conftest (a site plugin
# does), in which case jax's config already captured JAX_PLATFORMS=axon from
# the host env — override it post-import too.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
