"""Fused train-step tests: finiteness, parameter movement, G-period gating,
gradient-penalty pull toward unit input-gradient norm."""

import jax
import jax.numpy as jnp
import numpy as np

from srgan_tpu.apps.coefficient import CoefficientExperiment
from srgan_tpu.settings import Settings
from srgan_tpu.train import (ModelBundle, init_train_state,
                             make_gan_train_step, make_dnn_train_step)


def _setup(settings=None):
    settings = settings or Settings(batch_size=8, hidden_size=8,
                                    latent_dimension=10)
    exp = CoefficientExperiment(settings)
    models, d_params, g_params, dnn_params = exp.model_setup()
    state = init_train_state(settings, d_params, g_params, dnn_params)
    step = make_gan_train_step(settings, models)
    return settings, models, state, step


def _batch(settings, seed=0):
    rng = np.random.default_rng(seed)
    b = settings.batch_size
    labeled = jnp.asarray(rng.standard_normal((b, 10)), jnp.float32)
    labels = jnp.asarray(rng.standard_normal((b,)), jnp.float32)
    unlabeled = jnp.asarray(rng.standard_normal((b, 10)), jnp.float32)
    return labeled, labels, unlabeled


def _tree_changed(a, b):
    return any(not np.allclose(x, y) for x, y in
               zip(jax.tree.leaves(a), jax.tree.leaves(b)))


def test_step_runs_and_metrics_finite():
    settings, _, state, step = _setup()
    labeled, labels, unlabeled = _batch(settings)
    new_state, metrics = jax.jit(step)(state, labeled, labels, unlabeled,
                                       jax.random.key(0))
    for name in ("d_labeled_loss", "d_unlabeled_loss", "d_fake_loss",
                 "d_gradient_penalty", "d_total_loss", "g_loss", "dnn_loss"):
        assert np.isfinite(float(metrics[name])), name
    assert int(new_state.step) == 1
    assert float(metrics["d_gradient_penalty"]) >= 0.0


def test_step_updates_all_three_models():
    settings, _, state, step = _setup()
    labeled, labels, unlabeled = _batch(settings)
    new_state, _ = jax.jit(step)(state, labeled, labels, unlabeled,
                                 jax.random.key(1))
    assert _tree_changed(state.d_params, new_state.d_params)
    assert _tree_changed(state.g_params, new_state.g_params)
    assert _tree_changed(state.dnn_params, new_state.dnn_params)


def test_generator_period_gating():
    settings = Settings(batch_size=8, hidden_size=8,
                        generator_training_step_period=2)
    settings, _, state, step = _setup(settings)
    labeled, labels, unlabeled = _batch(settings)
    jitted = jax.jit(step)
    # step 0: G updates (0 % 2 == 0)
    s1, m1 = jitted(state, labeled, labels, unlabeled, jax.random.key(0))
    assert _tree_changed(state.g_params, s1.g_params)
    # step 1: G frozen
    s2, m2 = jitted(s1, labeled, labels, unlabeled, jax.random.key(1))
    assert not _tree_changed(s1.g_params, s2.g_params)
    assert float(m2["g_loss"]) == 0.0
    # D still updates on the skipped-G step
    assert _tree_changed(s1.d_params, s2.d_params)


def test_determinism_same_key_same_result():
    settings, _, state, step = _setup()
    labeled, labels, unlabeled = _batch(settings)
    jitted = jax.jit(step)
    out1, m1 = jitted(state, labeled, labels, unlabeled, jax.random.key(7))
    out2, m2 = jitted(state, labeled, labels, unlabeled, jax.random.key(7))
    for x, y in zip(jax.tree.leaves(out1), jax.tree.leaves(out2)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    assert float(m1["d_total_loss"]) == float(m2["d_total_loss"])


def test_dnn_only_step():
    settings, models, state, _ = _setup()
    dnn_step = make_dnn_train_step(settings, models)
    labeled, labels, _ = _batch(settings)
    new_state, metrics = jax.jit(dnn_step)(state, labeled, labels)
    assert np.isfinite(float(metrics["dnn_loss"]))
    assert _tree_changed(state.dnn_params, new_state.dnn_params)
    # GAN halves untouched in the DNN-only path
    assert not _tree_changed(state.d_params, new_state.d_params)
    assert not _tree_changed(state.g_params, new_state.g_params)


def test_training_reduces_losses_over_steps():
    """Short optimization sanity: supervised losses trend down (SURVEY §4
    integration criterion: loss decrease)."""
    settings = Settings(batch_size=32, hidden_size=16, learning_rate=1e-2)
    settings, _, state, step = _setup(settings)
    jitted = jax.jit(step)
    labeled, labels, unlabeled = _batch(settings)
    first = None
    key = jax.random.key(0)
    for i in range(60):
        key, sub = jax.random.split(key)
        state, metrics = jitted(state, labeled, labels, unlabeled, sub)
        if first is None:
            first = float(metrics["dnn_loss"])
    last = float(metrics["dnn_loss"])
    assert last < first
    assert float(metrics["d_labeled_loss"]) < 10.0


def test_hyper_overrides_match_settings_constants():
    """make_gan_train_step(hyper=...) with values equal to the settings
    constants must produce the IDENTICAL step (the sweep harness trains
    through this path); unknown keys fail fast."""
    import pytest

    settings, models, state, step = _setup()
    hyper = {"unlabeled_loss_multiplier": jnp.float32(
                 settings.unlabeled_loss_multiplier),
             "fake_loss_multiplier": jnp.float32(
                 settings.fake_loss_multiplier),
             "gradient_penalty_multiplier": jnp.float32(
                 settings.gradient_penalty_multiplier),
             "learning_rate": jnp.float32(settings.learning_rate)}
    step_h = make_gan_train_step(settings, models, hyper=hyper)
    labeled, labels, unlabeled = _batch(settings)
    s1, m1 = jax.jit(step)(state, labeled, labels, unlabeled,
                           jax.random.key(3))
    s2, m2 = jax.jit(step_h)(state, labeled, labels, unlabeled,
                             jax.random.key(3))
    for k in m1:
        np.testing.assert_allclose(float(m1[k]), float(m2[k]), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(s1), jax.tree.leaves(s2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)

    with pytest.raises(ValueError, match="unknown hyper"):
        make_gan_train_step(settings, models, hyper={"bogus": 1.0})


def test_hyper_overrides_change_training():
    """A different traced multiplier must actually change the update."""
    settings, models, state, step = _setup()
    step_h = make_gan_train_step(
        settings, models,
        hyper={"gradient_penalty_multiplier": jnp.float32(1000.0)})
    labeled, labels, unlabeled = _batch(settings)
    _, m1 = jax.jit(step)(state, labeled, labels, unlabeled,
                          jax.random.key(0))
    _, m2 = jax.jit(step_h)(state, labeled, labels, unlabeled,
                            jax.random.key(0))
    assert float(m2["d_gradient_penalty"]) > 10 * float(
        m1["d_gradient_penalty"])
