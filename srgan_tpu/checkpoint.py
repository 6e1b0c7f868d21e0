"""Orbax checkpoint / resume of the whole train-state pytree.

Reference: srgan.py (save_models/load_models via torch.save/torch.load of
DNN/D/G + optimizers into the trial dir; Settings.load_model_path resumes)
[H] — here the entire :class:`~srgan_tpu.train.SRGANTrainState` (params,
optimizer states, step) round-trips through Orbax (SURVEY.md §5).
"""

from __future__ import annotations

import os
from typing import Any

import jax
import orbax.checkpoint as ocp

CHECKPOINT_SUBDIR = "checkpoints"


def _abspath(path: str) -> str:
    return os.path.abspath(os.path.expanduser(path))


def save_state(state: Any, directory: str, step: int) -> str:
    """Save the train state under ``directory/checkpoints/step_<N>``
    (synchronous; use :class:`AsyncStateCheckpointer` inside train loops)."""
    path = os.path.join(_abspath(directory), CHECKPOINT_SUBDIR,
                        f"step_{step}")
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, state, force=True)
    return path


class AsyncStateCheckpointer:
    """Non-blocking periodic saves for the training loop.

    ``save()`` blocks only for the device→host copy (Orbax contract — so
    the train step may donate/overwrite the state buffers immediately
    after), while serialization + disk/remote writes proceed on background
    threads overlapping subsequent steps. Synchronous saves used to stall
    the step for the whole write on the remote-TPU tunnel.
    """

    def __init__(self):
        self._ckptr = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())

    def save(self, state: Any, directory: str, step: int) -> str:
        path = os.path.join(_abspath(directory), CHECKPOINT_SUBDIR,
                            f"step_{step}")
        self._ckptr.save(path, args=ocp.args.StandardSave(state),
                         force=True)
        return path

    def wait_until_finished(self) -> None:
        self._ckptr.wait_until_finished()

    def close(self) -> None:
        """Flush pending writes and join the background threads."""
        self._ckptr.close()


def latest_checkpoint(directory: str) -> str | None:
    root = os.path.join(_abspath(directory), CHECKPOINT_SUBDIR)
    if not os.path.isdir(root):
        return None
    steps = []
    for name in os.listdir(root):
        if name.startswith("step_"):
            try:
                steps.append((int(name.split("_", 1)[1]), name))
            except ValueError:
                continue
    if not steps:
        return None
    return os.path.join(root, max(steps)[1])


def restore_state(template: Any, path: str) -> Any:
    """Restore into the structure/shardings of ``template``.

    ``path`` may be a checkpoint dir (``.../step_N``) or a trial dir, in
    which case the latest checkpoint inside it is used — mirroring the
    reference's ``Settings.load_model_path`` semantics.
    """
    path = _abspath(path)
    if not os.path.basename(path).startswith("step_"):
        found = latest_checkpoint(path)
        if found is None:
            raise FileNotFoundError(f"no checkpoints under {path}")
        path = found
    abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, template)
    with ocp.StandardCheckpointer() as ckptr:
        try:
            return ckptr.restore(path, abstract)
        except (ValueError, KeyError) as error:
            # Orbax structure mismatches surface as opaque tree errors;
            # the usual cause is restoring under different architecture
            # settings than the trial was trained with (param module
            # paths differ — e.g. norm_impl 'xla' creates GroupNorm_N
            # while 'pallas' creates FusedGroupNormAct_N).
            raise ValueError(
                f"checkpoint at {path} does not match the current model "
                f"structure. Restore with the SAME architecture settings "
                f"the trial was trained with (norm_impl, crowd_model, "
                f"model_base_width, dnn_use_norm, ...). Original error: "
                f"{error}") from error
