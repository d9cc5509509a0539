"""Test configuration: force an 8-virtual-device CPU platform.

Multi-chip hardware is not available in CI; sharding tests run against a
virtual 8-device CPU mesh (`xla_force_host_platform_device_count`). Must be
set before jax is imported anywhere.
"""

import os

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

# persistent compilation cache: repeat test runs skip XLA recompiles
_CACHE = os.path.join(os.path.dirname(__file__), ".jax_cache")
os.makedirs(_CACHE, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
