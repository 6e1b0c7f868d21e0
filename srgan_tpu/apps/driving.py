"""Driving steering-angle application.

Reference: driving/srgan.py (DrivingExperiment) [A][M] — conv regressor
over channel-stacked dash-cam frames + matching DCGAN generator
(SURVEY.md §2 5d, §7 layer 5: reuses the image-app scaffolding).
"""

from __future__ import annotations

from typing import Any, Tuple

from srgan_tpu.apps.common import (setup_image_models,
                                   write_generated_sample_grid)
from srgan_tpu.data.driving import driving_datasets
from srgan_tpu.experiment import Experiment
from srgan_tpu.train import ModelBundle


class DrivingExperiment(Experiment):
    """SR-GAN steering-angle regression from frame stacks."""

    def dataset_setup(self) -> None:
        (self.labeled_dataset, self.unlabeled_dataset,
         self.validation_dataset,
         self.test_dataset) = driving_datasets(self.settings)

    def model_setup(self) -> Tuple[ModelBundle, Any, Any, Any]:
        return setup_image_models(
            self.settings, self.settings.resolved_driving_image_size,
            channels=3 * self.settings.driving_frame_stack)

    def validation_summaries(self, epoch: int, step: int) -> None:
        super().validation_summaries(epoch, step)
        # Reference emits G-sample grids for every image app (SURVEY.md §2
        # component 7); the stacked-frame G renders its latest frame.
        write_generated_sample_grid(self, epoch, step)
