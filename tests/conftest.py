"""Test env: force CPU with 8 virtual devices so multi-chip sharding tests
run anywhere (the driver validates real multi-chip separately).

The axon TPU plugin (sitecustomize) force-registers itself and sets
jax_platforms='axon,cpu'; overriding the env var is not enough — the config
must be updated after the jax import."""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
# persistent compile cache: XLA compiles dominate test time on 1-core CPU
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/evplp_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.2")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
