r"""Test harness configuration.

Mirrors the reference contract (reference: tests/conftest.py:10-43): the whole
numerical battery is validated in float64 on CPU. Additionally, 8 virtual XLA
CPU devices are forced so the sharding/mesh tests (tests/test_parallel.py) can
validate multi-chip semantics without TPU hardware.
"""

import os

# The driver environment pins JAX_PLATFORMS=axon (a tunneled TPU) and a
# sitecustomize imports jax before this file runs, so the env var alone is too
# late — use jax.config (effective until backends initialize).
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: DISABLED for the battery. A cross-test cache
# interaction segfaulted deserialization (jax compilation_cache.py:238,
# deterministic at the same test position, fresh cache dir included) once the
# round-2 kernel programs landed — and round 1 already saw silently-wrong
# numerics from cache misuse. Stability beats the few saved minutes; compile
# times within one run are unaffected (in-process jit cache).
# (Safe-usage notes kept for reference; re-enable only with a fresh dir and
# a green full battery.)
# executables — the platform is forced to cpu above.)
# jax.config.update("jax_compilation_cache_dir", "/tmp/zuko_tpu_jax_cache")
# jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
# jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import pytest  # noqa: E402


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)
