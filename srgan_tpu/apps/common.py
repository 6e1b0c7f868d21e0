"""Shared scaffolding for the image regression apps (age / driving).

Both bind the same trio — conv regressor D, conv regressor DNN baseline,
DCGAN generator — differing only in image size and channel count
(SURVEY.md §7 layer 3: the image-app scaffolding the driving app reuses).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp

from srgan_tpu.models.dcgan import ConvRegressor, DCGANGenerator
from srgan_tpu.train import ModelBundle
from srgan_tpu.utils.seeding import key_for


def write_generated_sample_grid(experiment, epoch: int, step: int,
                                count: int = 4) -> None:
    """G-sample image summaries shared by ALL image apps (age, driving,
    crowd override separately) — reference emits generated-sample grids
    for every image app (SURVEY.md §2 component 7 [A][H]).

    Frame-stacked inputs (driving) render the LAST 3 channels — frames
    concatenate oldest→newest along channels (data/driving.py), so the
    tail is the most recent frame; PNG/TensorBoard images are 3-channel.
    """
    if experiment.settings.dnn_only:
        return
    z = jax.random.normal(
        key_for(experiment.settings.seed + epoch, "samples"),
        (count, experiment.settings.latent_dimension))
    fakes = jax.device_get(
        experiment.models.g_apply(experiment.state.g_params, z))
    for i, image in enumerate(fakes):
        experiment.gan_summary_writer.add_image(
            f"generated/sample_{i}", image[..., -3:], step)


def setup_image_models(settings, image_size: int, channels: int = 3
                       ) -> Tuple[ModelBundle, Any, Any, Any]:
    """(models, d_params, g_params, dnn_params) for a conv-regression app."""
    if settings.image_normalization != "[-1,1]":
        # The age/driving npz stores are preprocessed to [-1,1] f32 (no
        # raw pixels to re-normalize); 'meanstd' is a crowd-app feature
        # (SURVEY §2 6c). Fail loudly rather than silently ignoring.
        raise ValueError(
            f"image_normalization={settings.image_normalization!r} is "
            f"supported by the crowd app only; age/driving databases "
            f"are stored [-1,1]-normalized")
    dtype = jnp.dtype(settings.compute_dtype)
    width = settings.model_base_width
    impl = settings.norm_impl
    d_model = ConvRegressor(base_width=width, feature_size=16 * width,
                            dtype=dtype, norm_impl=impl)
    dnn_model = ConvRegressor(base_width=width, feature_size=16 * width,
                              dtype=dtype, norm_impl=impl)
    g_model = DCGANGenerator(image_size=image_size, channels=channels,
                             base_width=width,
                             latent_dimension=settings.latent_dimension,
                             dtype=dtype, norm_impl=impl)
    init_key = key_for(settings.seed, "init")
    k_d, k_g, k_dnn = jax.random.split(init_key, 3)
    image = jnp.zeros((1, image_size, image_size, channels), jnp.float32)
    z = jnp.zeros((1, settings.latent_dimension), jnp.float32)
    d_params = d_model.init(k_d, image)
    g_params = g_model.init(k_g, z)
    dnn_params = dnn_model.init(k_dnn, image)
    models = ModelBundle(d_apply=d_model.apply, g_apply=g_model.apply,
                         dnn_apply=dnn_model.apply)
    return models, d_params, g_params, dnn_params
