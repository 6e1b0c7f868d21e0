"""Coefficient-estimation application (CPU-runnable fidelity config).

Reference: coefficient/srgan.py (CoefficientExperiment) [H], SURVEY.md §3.4 —
binds the synthetic polynomial data to the MLP G/D and per-epoch MAE/NVE
validation. First config the build reproduces end-to-end (SURVEY.md §7
layer 1).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp

from srgan_tpu.data.coefficient import (OBSERVATION_COUNT,
                                        coefficient_datasets)
from srgan_tpu.experiment import Experiment
from srgan_tpu.models.mlp import CoefficientGenerator, CoefficientMLP
from srgan_tpu.train import ModelBundle
from srgan_tpu.utils.seeding import key_for


class CoefficientExperiment(Experiment):
    """SR-GAN on the polynomial-coefficient toy task."""

    def dataset_setup(self) -> None:
        (self.labeled_dataset, self.unlabeled_dataset,
         self.validation_dataset,
         self.test_dataset) = coefficient_datasets(self.settings)

    def model_setup(self) -> Tuple[ModelBundle, Any, Any, Any]:
        settings = self.settings
        dtype = jnp.dtype(settings.compute_dtype)
        generator = CoefficientGenerator(
            observation_count=OBSERVATION_COUNT,
            hidden_size=settings.hidden_size, dtype=dtype)
        discriminator = CoefficientMLP(hidden_size=settings.hidden_size,
                                       dtype=dtype)
        dnn = CoefficientMLP(hidden_size=settings.hidden_size, dtype=dtype)

        init_key = key_for(settings.seed, "init")
        k_d, k_g, k_dnn = jax.random.split(init_key, 3)
        obs = jnp.zeros((1, OBSERVATION_COUNT), jnp.float32)
        z = jnp.zeros((1, settings.latent_dimension), jnp.float32)
        d_params = discriminator.init(k_d, obs)
        g_params = generator.init(k_g, z)
        dnn_params = dnn.init(k_dnn, obs)
        models = ModelBundle(d_apply=discriminator.apply,
                             g_apply=generator.apply,
                             dnn_apply=dnn.apply)
        return models, d_params, g_params, dnn_params
