"""TensorBoard observability.

Reference: utility.py (SummaryWriter wrapper over tensorboardX, with a global
``step``, a ``summary_period`` and an ``is_summary_step`` gate) [A][H].

The wrapper keeps identical scalar-name semantics so reference TensorBoard
runs are directly comparable; it degrades to a JSONL writer if tensorboardX
is unavailable (keeps headless tests hermetic).
"""

from __future__ import annotations

import datetime
import json
import os
from typing import Optional

import numpy as np

try:  # tensorboardX is in the baked image; JSONL fallback keeps tests hermetic
    from tensorboardX import SummaryWriter as _TBWriter
except Exception:  # pragma: no cover
    _TBWriter = None


class SummaryWriter:
    """tensorboardX writer + step/period gating (reference semantics)."""

    def __init__(self, log_directory: str, summary_period: int = 1,
                 use_tensorboard: bool = True):
        self.step = 0
        self.summary_period = summary_period
        self.log_directory = log_directory
        os.makedirs(log_directory, exist_ok=True)
        self._tb = (_TBWriter(log_directory)
                    if (use_tensorboard and _TBWriter is not None) else None)
        self._jsonl_path = os.path.join(log_directory, "scalars.jsonl")

    def is_summary_step(self) -> bool:
        return self.step % self.summary_period == 0

    def add_scalar(self, tag: str, value, step: Optional[int] = None) -> None:
        step = self.step if step is None else step
        value = float(np.asarray(value))
        if self._tb is not None:
            self._tb.add_scalar(tag, value, step)
        with open(self._jsonl_path, "a") as f:
            f.write(json.dumps({"tag": tag, "value": value, "step": step})
                    + "\n")

    def add_image(self, tag: str, image: np.ndarray,
                  step: Optional[int] = None) -> None:
        """image: [H, W, C] float in [0, 1] or [-1, 1].

        Besides the TensorBoard event, the image is dumped as a PNG under
        ``<log_dir>/images/`` so trial artifacts (e.g. G-sample grids) are
        inspectable without TensorBoard and assertable by tests.
        """
        step = self.step if step is None else step
        image = np.asarray(image, dtype=np.float32)
        if image.min() < 0:
            image = (image + 1.0) / 2.0
        image = np.clip(image, 0.0, 1.0)
        if self._tb is not None:
            self._tb.add_image(tag, image, step, dataformats="HWC")
        try:
            from PIL import Image as _PILImage
        except Exception:  # pragma: no cover
            return
        image_dir = os.path.join(self.log_directory, "images")
        os.makedirs(image_dir, exist_ok=True)
        name = f"{tag.replace('/', '_')}_{step}.png"
        _PILImage.fromarray((image * 255).astype(np.uint8)).save(
            os.path.join(image_dir, name))

    def close(self) -> None:
        if self._tb is not None:
            self._tb.close()


def make_trial_directory(settings) -> str:
    """Unique trial dir: logs/<settings-derived name>_<timestamp>.

    Reference: utility.py trial-dir naming (timestamp + settings-derived
    name) [A][H].
    """
    stamp = datetime.datetime.now().strftime("y%Ym%md%dh%Hm%Ms%S")
    base = os.path.join(settings.logs_directory,
                        f"{settings.trial_directory_name()}_{stamp}")
    # Second-resolution timestamps collide when trials start back-to-back
    # (sweeps, tests); uniquify instead of silently sharing a directory.
    trial_dir = base
    suffix = 1
    while True:
        try:
            os.makedirs(trial_dir)
            return trial_dir
        except FileExistsError:
            trial_dir = f"{base}_{suffix}"
            suffix += 1
