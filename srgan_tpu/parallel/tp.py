"""Tensor parallelism: channel-sharded parameters on a 2-D (data × model)
mesh.

The reference has no parallelism at all (SURVEY.md §2 component 12); data
parallelism is this framework's production strategy for the small SR-GAN
convnets. This module adds the *capability* to also shard model weights
over a second mesh axis the GSPMD way: annotate parameter shardings (output
channels on the ``model`` axis where divisible) and let XLA partition the
convolutions/matmuls and insert the collectives. No model-code changes —
sharding is a property of the arrays, not the modules.

Useful when per-chip HBM is the constraint (very wide JointCNN variants) or
to shrink per-chip batch without shrinking global batch.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from srgan_tpu.parallel.mesh import DATA_AXIS

MODEL_AXIS = "model"


def make_mesh_2d(data_devices: int, model_devices: int,
                 devices=None) -> Mesh:
    """(data × model) mesh over local devices."""
    if devices is None:
        devices = jax.devices()
    need = data_devices * model_devices
    if len(devices) < need:
        raise ValueError(f"need {need} devices, have {len(devices)}")
    grid = np.asarray(devices[:need]).reshape(data_devices, model_devices)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def _leaf_spec(leaf: Any, model_size: int) -> P:
    """Shard the trailing (output-channel) axis on 'model' when it divides
    evenly and is wide enough to be worth splitting; replicate otherwise.

    Works uniformly for conv kernels [kh, kw, cin, cout], dense kernels
    [cin, cout], biases/scales [cout], and optimizer moments (same shapes).
    """
    shape = getattr(leaf, "shape", ())
    if (len(shape) >= 1 and shape[-1] % model_size == 0
            and shape[-1] >= 2 * model_size):
        return P(*([None] * (len(shape) - 1) + [MODEL_AXIS]))
    return P()


def state_shardings(state: Any, mesh: Mesh) -> Any:
    """Per-leaf NamedShardings for a train-state pytree (params AND
    optimizer moments — Adam's mu/nu mirror the param shapes, so the same
    rule shards them consistently)."""
    model_size = mesh.shape[MODEL_AXIS]
    return jax.tree.map(
        lambda leaf: NamedSharding(mesh, _leaf_spec(leaf, model_size)),
        state)


def jit_data_model_parallel(step_fn, mesh: Mesh, state_template: Any,
                            num_batch_args: int = 3,
                            donate_state: bool = True,
                            has_key: bool = True):
    """jit a ``step(state, *batch[, key])`` over a (data × model) mesh:
    batch sharded on 'data', parameters/opt-state channel-sharded on
    'model', metrics replicated."""
    state_shard = state_shardings(state_template, mesh)
    batch = NamedSharding(mesh, P(DATA_AXIS))
    repl = NamedSharding(mesh, P())
    in_shardings = ((state_shard,) + (batch,) * num_batch_args
                    + ((repl,) if has_key else ()))
    return jax.jit(step_fn, in_shardings=in_shardings,
                   out_shardings=(state_shard, repl),
                   donate_argnums=(0,) if donate_state else ())


def place_state(state: Any, mesh: Mesh) -> Any:
    """device_put a host train state with its 2-D shardings."""
    return jax.tree.map(
        lambda leaf, sh: jax.device_put(leaf, sh),
        state, state_shardings(state, mesh))
