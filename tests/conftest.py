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

# Persistent XLA compilation cache for the test suite: the slow tier is
# dominated by CPU compiles of full epoch / multiseed / mesh programs
# (one test alone compiles ~20 min on this 1-core box); with the cache,
# re-runs skip every unchanged compile. Exported via env so subprocess
# tests (CLI apps, multihost children) inherit it.
_cache_dir = os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(
        os.path.expanduser("~"), ".cache", "sed_crnn_tpu", "xla-tests"
    ),
)
os.makedirs(_cache_dir, exist_ok=True)

import jax  # noqa: E402

# The pytest process may have imported jax before this conftest (a site plugin
# does), in which case jax's config already captured JAX_PLATFORMS=axon from
# the host env — override it post-import too.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
