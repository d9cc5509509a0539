"""Test configuration: force an 8-virtual-device CPU platform.

Multi-chip hardware is not available in CI; sharding tests run against a
virtual 8-device CPU mesh (`xla_force_host_platform_device_count`). Must be
set before jax is imported anywhere.
"""

import os
import sys

# FORCE cpu: the shell exports JAX_PLATFORMS=axon (the real TPU tunnel) and
# the axon sitecustomize overrides even an env-level JAX_PLATFORMS=cpu —
# running the suite against the single remote TPU serializes every compile
# through the tunnel. jax.config.update below is the authoritative override.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")  # beats the axon sitecustomize
jax.config.update("jax_default_matmul_precision", "highest")

# persistent compilation cache: repeat test runs skip XLA recompiles.
# Scoped by a host-CPU fingerprint: a cache carried over from a machine
# with different CPU features (serialized AOT executables embed them, the
# loader only warns) segfaulted the suite in round 5 — a feature-set
# change now selects a fresh directory instead.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from hotrack_tpu.utils.cache_fingerprint import machine_fingerprint  # noqa: E402

_CACHE = (os.path.join(os.path.dirname(__file__), ".jax_cache")
          + "-" + machine_fingerprint())
os.makedirs(_CACHE, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


# Round-5 stability: with ~150 tests in one process the accumulated live
# executables eventually segfault XLA:CPU inside the compilation-cache
# serialize/deserialize path (reproduced twice at ~85% of the suite, in
# test_stream, with 120 GB free RAM — an XLA bug tied to in-process state,
# not memory). Dropping the jit caches between test modules keeps the live
# set small; the persistent disk cache makes the resulting recompiles
# cheap reloads.
import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    yield
    jax.clear_caches()
