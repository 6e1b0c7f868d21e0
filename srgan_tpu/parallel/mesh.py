"""Data-parallel substrate: mesh + sharding + jitted step wiring.

The reference is single-process single-GPU (SURVEY.md §2 component 12 [H]) —
parallelism is NEW capability, built the TPU way: a 1-D
``jax.sharding.Mesh`` over the 'data' axis, batches sharded along axis 0,
parameters/optimizer state replicated, and the gradient all-reduce emitted
BY XLA over ICI as a consequence of the sharding annotations — no NCCL-style
explicit collectives (SURVEY.md §5 distributed-communication row [A]).

Correctness note for SR-GAN specifically: the feature-matching losses reduce
over BATCH-MEAN features. Because the jitted step is one global program over
the mesh (GSPMD), ``mean(axis=0)`` over a 'data'-sharded batch lowers to a
partial-sum + ``psum`` over ICI automatically — the 8-device loss is
bitwise-equivalent (up to fp reduction order) to the 1-device loss, which
tests/test_parallel.py asserts.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(num_devices: Optional[int] = None,
              devices: Optional[Sequence[jax.Device]] = None,
              axis_name: str = DATA_AXIS) -> Mesh:
    """1-D data-parallel mesh over local devices (ICI on a real slice)."""
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def data_axis_size(mesh: Mesh) -> int:
    """Devices along the 'data' axis — equals ``mesh.size`` on the 1-D
    dp mesh; on a 2-D (data × model) mesh it is the batch-sharding
    divisor (batch/dataset sharding math must use THIS, not total
    devices)."""
    return mesh.shape[DATA_AXIS]


def is_model_parallel(mesh: Mesh) -> bool:
    """True for a 2-D (data × model) mesh (srgan_tpu.parallel.tp)."""
    return "model" in mesh.shape


def batch_sharding(mesh: Mesh, axis_name: str = DATA_AXIS) -> NamedSharding:
    """Shard axis 0 (batch) over the data axis."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, *arrays: Any, axis_name: str = DATA_AXIS):
    """Device-put host arrays with batch-axis sharding (input pipeline tail).

    Batch sizes must divide the mesh size — static shapes keep XLA happy
    (SURVEY.md §7 design stance).
    """
    sharding = batch_sharding(mesh, axis_name)
    out = tuple(jax.device_put(a, sharding) for a in arrays)
    return out[0] if len(out) == 1 else out


def shard_map_fn(fn: Callable, mesh: Mesh, in_specs, out_specs
                 ) -> Callable:
    """``jax.shard_map`` across jax versions (the public API moved out of
    experimental in jax 0.8; the replication-check kwarg was renamed).
    Used to run per-device Pallas input kernels under an explicit mesh
    program (GSPMD cannot partition custom calls on its own)."""
    try:
        from jax import shard_map
        kwargs = {"check_vma": False}
    except ImportError:  # pragma: no cover — older jax
        from jax.experimental.shard_map import shard_map
        kwargs = {"check_rep": False}
    return shard_map(fn, mesh=mesh, in_specs=in_specs,
                     out_specs=out_specs, **kwargs)


def jit_data_parallel(step_fn: Callable, mesh: Mesh,
                      num_batch_args: int = 3,
                      donate_state: bool = True,
                      has_key: bool = True,
                      axis_name: str = DATA_AXIS) -> Callable:
    """jit a ``step(state, *batch_arrays[, key])`` data-parallel over
    ``mesh``.

    State (arg 0) and the PRNG key (last arg, if ``has_key``) are
    replicated; the ``num_batch_args`` arrays in between are sharded on
    axis 0. The state is donated so parameter/optimizer buffers update in
    place in HBM — no per-step reallocation (SURVEY.md §7 layer 6, donated
    buffers).
    """
    repl = replicated_sharding(mesh)
    batch = batch_sharding(mesh, axis_name)
    in_shardings = ((repl,) + (batch,) * num_batch_args
                    + ((repl,) if has_key else ()))
    out_shardings = (repl, repl)
    return jax.jit(step_fn, in_shardings=in_shardings,
                   out_shardings=out_shardings,
                   donate_argnums=(0,) if donate_state else ())
