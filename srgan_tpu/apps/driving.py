"""Driving steering-angle application.

Reference: driving/srgan.py (DrivingExperiment) [A][M] — conv regressor
over channel-stacked dash-cam frames + matching DCGAN generator
(SURVEY.md §2 5d, §7 layer 5: reuses the image-app scaffolding).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp

from srgan_tpu.data.driving import driving_datasets
from srgan_tpu.experiment import Experiment
from srgan_tpu.models.dcgan import ConvRegressor, DCGANGenerator
from srgan_tpu.train import ModelBundle
from srgan_tpu.utils.seeding import key_for


class DrivingExperiment(Experiment):
    """SR-GAN steering-angle regression from frame stacks."""

    def dataset_setup(self) -> None:
        (self.labeled_dataset, self.unlabeled_dataset,
         self.validation_dataset) = driving_datasets(self.settings)

    def model_setup(self) -> Tuple[ModelBundle, Any, Any, Any]:
        settings = self.settings
        dtype = jnp.dtype(settings.compute_dtype)
        size = settings.age_image_size
        channels = 3 * settings.driving_frame_stack
        width = settings.model_base_width
        d_model = ConvRegressor(base_width=width,
                                feature_size=16 * width, dtype=dtype)
        dnn_model = ConvRegressor(base_width=width,
                                  feature_size=16 * width, dtype=dtype)
        g_model = DCGANGenerator(image_size=size, channels=channels,
                                 base_width=width,
                                 latent_dimension=settings.latent_dimension,
                                 dtype=dtype)
        init_key = key_for(settings.seed, "init")
        k_d, k_g, k_dnn = jax.random.split(init_key, 3)
        frames = jnp.zeros((1, size, size, channels), jnp.float32)
        z = jnp.zeros((1, settings.latent_dimension), jnp.float32)
        d_params = d_model.init(k_d, frames)
        g_params = g_model.init(k_g, z)
        dnn_params = dnn_model.init(k_dnn, frames)
        models = ModelBundle(d_apply=d_model.apply, g_apply=g_model.apply,
                             dnn_apply=dnn_model.apply)
        return models, d_params, g_params, dnn_params
