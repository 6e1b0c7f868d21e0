"""Model shape/feature-side-channel tests (SURVEY.md §2 components 4, 5)."""

import jax
import jax.numpy as jnp

from srgan_tpu.models import (CoefficientGenerator, CoefficientMLP,
                              ConvRegressor, CrowdDCGenerator,
                              DCGANGenerator, JointCNN)


def test_coefficient_models_shapes():
    key = jax.random.key(0)
    g = CoefficientGenerator(observation_count=10, hidden_size=16)
    z = jnp.zeros((4, 10))
    gp = g.init(key, z)
    fake = g.apply(gp, z)
    assert fake.shape == (4, 10)

    d = CoefficientMLP(hidden_size=16)
    dp = d.init(key, fake)
    pred, feats = d.apply(dp, fake)
    assert pred.shape == (4,)
    assert feats.shape == (4, 16)


def test_dcgan_generator_shape_and_range():
    key = jax.random.key(0)
    g = DCGANGenerator(image_size=32, channels=3, base_width=16,
                       latent_dimension=8)
    z = jax.random.normal(key, (2, 8))
    params = g.init(key, z)
    img = g.apply(params, z)
    assert img.shape == (2, 32, 32, 3)
    assert float(jnp.max(jnp.abs(img))) <= 1.0


def test_conv_regressor_shapes():
    key = jax.random.key(0)
    d = ConvRegressor(base_width=16, feature_size=64)
    x = jnp.zeros((2, 32, 32, 3))
    params = d.init(key, x)
    pred, feats = d.apply(params, x)
    assert pred.shape == (2,)
    assert feats.shape == (2, 64)


def test_joint_cnn_two_heads():
    key = jax.random.key(0)
    m = JointCNN(base_width=16)
    x = jnp.zeros((2, 32, 32, 3))
    params = m.init(key, x)
    (density, count), feats = m.apply(params, x)
    assert density.shape == (2, 8, 8)   # 1/4 resolution
    assert count.shape == (2, 8, 8)
    assert feats.shape == (2, 64)


def test_crowd_generator_patch_shape():
    key = jax.random.key(0)
    g = CrowdDCGenerator(image_size=32, base_width=16, latent_dimension=8)
    z = jnp.zeros((2, 8))
    params = g.init(key, z)
    assert g.apply(params, z).shape == (2, 32, 32, 3)
