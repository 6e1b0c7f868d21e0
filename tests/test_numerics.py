"""Numerics guards: golden-trace regression for the fidelity config,
bf16 finiteness, debug_nans plumbing."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from srgan_tpu.apps.coefficient import CoefficientExperiment
from srgan_tpu.settings import Settings
from srgan_tpu.train import init_train_state, make_gan_train_step


def _run_trace(settings, n_steps=5):
    exp = CoefficientExperiment(settings)
    models, d, g, dnn = exp.model_setup()
    state = init_train_state(settings, d, g, dnn)
    step = jax.jit(make_gan_train_step(settings, models))
    rng = np.random.default_rng(7)
    b = settings.batch_size
    labeled = jnp.asarray(rng.standard_normal((b, 10)), jnp.float32)
    labels = jnp.asarray(rng.standard_normal((b,)), jnp.float32)
    unlabeled = jnp.asarray(rng.standard_normal((b, 10)), jnp.float32)
    key = jax.random.key(11)
    trace = []
    for _ in range(n_steps):
        key, sub = jax.random.split(key)
        state, metrics = step(state, labeled, labels, unlabeled, sub)
        trace.append(float(metrics["d_total_loss"]))
    return trace


def test_golden_trace_coefficient():
    """Fixed seed + fixed batch → the loss trajectory of the fidelity
    config must stay put across refactors (recorded 2026-08-16 on CPU at
    highest matmul precision; re-record deliberately if the math is
    intentionally changed)."""
    settings = Settings(batch_size=16, hidden_size=8, latent_dimension=10,
                        seed=0)
    trace = _run_trace(settings)
    golden = [9.636924743652344, 9.59046459197998, 9.82459545135498,
              9.50302505493164, 9.405645370483398]
    np.testing.assert_allclose(trace, golden, rtol=1e-4)


def test_bf16_compute_stays_finite_and_close():
    f32 = _run_trace(Settings(batch_size=16, hidden_size=8, seed=0))
    bf16 = _run_trace(Settings(batch_size=16, hidden_size=8, seed=0,
                               compute_dtype="bfloat16"))
    assert all(np.isfinite(v) for v in bf16)
    # same trajectory within bf16 tolerance
    np.testing.assert_allclose(bf16, f32, rtol=0.05)


def test_debug_nans_setting_plumbs_through(tmp_path):
    settings = Settings(trial_name="nan", debug_nans=True,
                        logs_directory=str(tmp_path / "logs"),
                        batch_size=8, hidden_size=8, steps_to_run=1,
                        labeled_dataset_size=16,
                        unlabeled_dataset_size=16,
                        validation_dataset_size=8)
    exp = CoefficientExperiment(settings)
    exp.train()
    # the flag is active during training but restored afterwards (no
    # process-wide leak into later experiments/benchmarks)
    assert not jax.config.jax_debug_nans


def test_compilation_cache_dir_setting_applied(tmp_path):
    """Plumbing only: asserts the jax config is pointed at the setting
    (for BOTH train and evaluate-only flows). The cache backend itself
    initializes once per process — the suite's conftest cache wins here,
    so actual disk population is verified on hardware (BASELINE.md),
    not in this test."""
    cache = str(tmp_path / "xla_cache")
    settings = Settings(trial_name="cache",
                        compilation_cache_dir=cache,
                        logs_directory=str(tmp_path / "logs"),
                        batch_size=8, hidden_size=8, steps_to_run=1,
                        labeled_dataset_size=16,
                        unlabeled_dataset_size=16,
                        validation_dataset_size=8)
    exp = CoefficientExperiment(settings)
    exp.train()
    assert jax.config.jax_compilation_cache_dir == cache

    # evaluate-only flow applies it too (repeat evaluations were the
    # scenario the setting was inert for; review r3)
    jax.config.update("jax_compilation_cache_dir", None)
    fresh = CoefficientExperiment(settings)
    fresh.prepare_for_evaluation(exp.trial_directory)
    assert jax.config.jax_compilation_cache_dir == cache
