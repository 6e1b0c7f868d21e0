"""Unit tests for the SR-GAN loss stack (SURVEY.md §4: sign/scale/value on
hand-computable inputs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from srgan_tpu import losses


def test_labeled_loss_mse():
    pred = jnp.array([1.0, 2.0, 3.0])
    lab = jnp.array([0.0, 2.0, 5.0])
    # mean(1^2, 0, 2^2) = 5/3
    np.testing.assert_allclose(losses.labeled_loss(pred, lab, order=2.0),
                               5.0 / 3.0, rtol=1e-6)
    np.testing.assert_allclose(losses.labeled_loss(pred, lab, order=1.0),
                               1.0, rtol=1e-6)


def test_feature_distance_hand_value():
    a = jnp.array([[1.0, 0.0], [3.0, 0.0]])   # mean (2, 0)
    b = jnp.array([[0.0, 4.0], [0.0, 4.0]])   # mean (0, 4)
    # L2: sqrt(4 + 16) = sqrt(20); L1: 2 + 4 = 6
    np.testing.assert_allclose(losses.feature_distance(a, b, order=2.0),
                               np.sqrt(20.0), rtol=1e-5)
    np.testing.assert_allclose(losses.feature_distance(a, b, order=1.0),
                               6.0, rtol=1e-6)


def test_feature_distance_symmetric_and_zero():
    a = jnp.ones((4, 3))
    assert float(losses.feature_distance(a, a)) == pytest.approx(0.0,
                                                                 abs=1e-5)
    b = jnp.zeros((4, 3))
    d_ab = float(losses.feature_distance(a, b))
    d_ba = float(losses.feature_distance(b, a))
    assert d_ab == pytest.approx(d_ba, rel=1e-6)


def test_unlabeled_loss_multiplier_scaling():
    a = jnp.array([[1.0, 2.0]])
    b = jnp.array([[3.0, 4.0]])
    base = float(losses.unlabeled_loss(a, b, multiplier=1.0))
    assert float(losses.unlabeled_loss(a, b, multiplier=2.5)) == \
        pytest.approx(2.5 * base, rel=1e-6)


def test_fake_loss_is_negative_log_scaled():
    """Contrasting loss = −log(d + 1): negative, decreasing in distance."""
    unl = jnp.zeros((2, 4))
    near = jnp.full((2, 4), 0.5)
    far = jnp.full((2, 4), 5.0)
    l_near = float(losses.fake_loss(unl, near, order=1.0))
    l_far = float(losses.fake_loss(unl, far, order=1.0))
    assert l_near < 0 or l_near == 0
    assert l_far < l_near  # pushing further away lowers the loss
    # hand value: distance L1 = 4*5 = 20 → −log(21)
    np.testing.assert_allclose(l_far, -np.log(21.0), rtol=1e-4)


def test_generator_loss_opposes_fake_loss_direction():
    unl = jnp.zeros((2, 4))
    fake = jnp.full((2, 4), 2.0)
    g = float(losses.generator_loss(unl, fake))
    assert g > 0  # G minimizes distance; positive when apart


def test_gradient_penalty_hand_value():
    # gradients with per-example norms 0 and 2 → mean((0-1)^2,(2-1)^2)=1
    grads = jnp.array([[0.0, 0.0], [2.0, 0.0]])
    np.testing.assert_allclose(
        losses.gradient_penalty(grads, multiplier=1.0), 1.0, rtol=1e-5)
    np.testing.assert_allclose(
        losses.gradient_penalty(grads, multiplier=10.0), 10.0, rtol=1e-5)


def test_gradient_penalty_minimum_at_unit_norm():
    grads = jnp.array([[1.0, 0.0], [0.0, 1.0]])
    np.testing.assert_allclose(
        losses.gradient_penalty(grads, multiplier=10.0), 0.0, atol=1e-6)


def test_interpolate_inputs_endpoints_and_broadcast():
    unl = jnp.ones((3, 2, 2)) * 4.0
    fake = jnp.zeros((3, 2, 2))
    alpha = jnp.array([1.0, 0.0, 0.5])
    interp = losses.interpolate_inputs(alpha, unl, fake)
    np.testing.assert_allclose(interp[0], 4.0)
    np.testing.assert_allclose(interp[1], 0.0)
    np.testing.assert_allclose(interp[2], 2.0)


def test_feature_distance_grad_finite_at_zero():
    """The epsilon in the L2 branch keeps d/dx sqrt(0) finite."""
    a = jnp.ones((2, 3))
    g = jax.grad(lambda x: losses.feature_distance(x, jnp.ones((2, 3))))(a)
    assert np.all(np.isfinite(np.asarray(g)))
