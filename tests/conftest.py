"""Test harness: force an 8-virtual-device CPU platform.

SURVEY.md §4: multi-device tests without a cluster — 8 virtual CPU devices
stand in for the TPU slice so the data-parallel all-reduce parity tests run
hermetically.

The ambient environment pins ``JAX_PLATFORMS=axon`` (a remote-TPU tunnel)
and a sitecustomize module imports jax at interpreter start, so env vars are
already consumed by the time conftest runs; ``jax.config.update`` is the
reliable override at this point.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_default_matmul_precision", "highest")
# Suite wall-time is compile-dominated; persist compiled executables so
# repeated runs (driver, local iteration) skip recompilation.
jax.config.update("jax_compilation_cache_dir",
                  "/tmp/jax_compilation_cache_srgan_tests")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
