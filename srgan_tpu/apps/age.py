"""Age-estimation application (IMDB-WIKI): DNN baseline and SR-GAN configs.

Reference: age/srgan.py (AgeExperiment) [H] — DCGAN-style generator + conv
age regressor; the "age DNN" config (BASELINE.json configs list) is the
same experiment with ``settings.dnn_only=True`` (supervised stream only).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp

from srgan_tpu.data.age import age_datasets
from srgan_tpu.experiment import Experiment
from srgan_tpu.models.dcgan import ConvRegressor, DCGANGenerator
from srgan_tpu.train import ModelBundle
from srgan_tpu.utils.seeding import key_for


class AgeExperiment(Experiment):
    """SR-GAN (or DNN-only) age regression from face images."""

    def dataset_setup(self) -> None:
        (self.labeled_dataset, self.unlabeled_dataset,
         self.validation_dataset) = age_datasets(self.settings)

    def model_setup(self) -> Tuple[ModelBundle, Any, Any, Any]:
        settings = self.settings
        dtype = jnp.dtype(settings.compute_dtype)
        size = settings.age_image_size
        width = settings.model_base_width
        d_model = ConvRegressor(base_width=width,
                                feature_size=16 * width, dtype=dtype)
        dnn_model = ConvRegressor(base_width=width,
                                  feature_size=16 * width, dtype=dtype)
        g_model = DCGANGenerator(image_size=size, base_width=width,
                                 latent_dimension=settings.latent_dimension,
                                 dtype=dtype)
        init_key = key_for(settings.seed, "init")
        k_d, k_g, k_dnn = jax.random.split(init_key, 3)
        image = jnp.zeros((1, size, size, 3), jnp.float32)
        z = jnp.zeros((1, settings.latent_dimension), jnp.float32)
        d_params = d_model.init(k_d, image)
        g_params = g_model.init(k_g, z)
        dnn_params = dnn_model.init(k_dnn, image)
        models = ModelBundle(d_apply=d_model.apply, g_apply=g_model.apply,
                             dnn_apply=dnn_model.apply)
        return models, d_params, g_params, dnn_params

    def validation_summaries(self, epoch: int, step: int) -> None:
        super().validation_summaries(epoch, step)
        # Image-app extra (reference: generated-sample image grids [A][H]):
        if not self.settings.dnn_only:
            z = jax.random.normal(
                key_for(self.settings.seed + epoch, "samples"),
                (4, self.settings.latent_dimension))
            fakes = jax.device_get(
                self.models.g_apply(self.state.g_params, z))
            for i, image in enumerate(fakes):
                self.gan_summary_writer.add_image(
                    f"generated/sample_{i}", image, step)
