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
