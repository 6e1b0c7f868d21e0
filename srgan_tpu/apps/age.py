"""Age-estimation application (IMDB-WIKI): DNN baseline and SR-GAN configs.

Reference: age/srgan.py (AgeExperiment) [H] — DCGAN-style generator + conv
age regressor; the "age DNN" config (BASELINE.json configs list) is the
same experiment with ``settings.dnn_only=True`` (supervised stream only).
"""

from __future__ import annotations

from typing import Any, Tuple

from srgan_tpu.apps.common import (setup_image_models,
                                   write_generated_sample_grid)
from srgan_tpu.data.age import age_datasets
from srgan_tpu.experiment import Experiment
from srgan_tpu.train import ModelBundle


class AgeExperiment(Experiment):
    """SR-GAN (or DNN-only) age regression from face images."""

    def dataset_setup(self) -> None:
        (self.labeled_dataset, self.unlabeled_dataset,
         self.validation_dataset,
         self.test_dataset) = age_datasets(self.settings)

    def model_setup(self) -> Tuple[ModelBundle, Any, Any, Any]:
        return setup_image_models(self.settings,
                                  self.settings.age_image_size)

    def validation_summaries(self, epoch: int, step: int) -> None:
        super().validation_summaries(epoch, step)
        # Image-app extra (reference: generated-sample image grids [A][H]):
        write_generated_sample_grid(self, epoch, step)
