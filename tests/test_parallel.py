"""Data-parallel parity: same global batch → same losses on 1 vs 8 virtual
devices (SURVEY.md §4 multi-device-without-a-cluster strategy)."""

import jax
import numpy as np
import pytest

from srgan_tpu.apps.coefficient import CoefficientExperiment
from srgan_tpu.parallel import (batch_sharding, jit_data_parallel, make_mesh,
                                replicated_sharding, shard_batch)
from srgan_tpu.settings import Settings
from srgan_tpu.train import init_train_state, make_gan_train_step


def _setup():
    settings = Settings(batch_size=16, hidden_size=8)
    exp = CoefficientExperiment(settings)
    models, d_params, g_params, dnn_params = exp.model_setup()
    state = init_train_state(settings, d_params, g_params, dnn_params)
    step = make_gan_train_step(settings, models)
    rng = np.random.default_rng(0)
    batch = (rng.standard_normal((16, 10)).astype(np.float32),
             rng.standard_normal((16,)).astype(np.float32),
             rng.standard_normal((16, 10)).astype(np.float32))
    return settings, state, step, batch


def test_eight_virtual_devices_available():
    assert jax.device_count() >= 8


@pytest.mark.parametrize("donate", [False])
def test_1dev_vs_8dev_same_losses(donate):
    settings, state, step, batch = _setup()
    key = jax.random.key(3)

    mesh1 = make_mesh(1)
    mesh8 = make_mesh(8)
    step1 = jit_data_parallel(step, mesh1, donate_state=donate)
    step8 = jit_data_parallel(step, mesh8, donate_state=donate)

    b1 = shard_batch(mesh1, *batch)
    b8 = shard_batch(mesh8, *batch)
    s1, m1 = step1(state, *b1, key)
    s8, m8 = step8(state, *b8, key)

    for name in m1:
        np.testing.assert_allclose(float(m1[name]), float(m8[name]),
                                   rtol=2e-4, atol=2e-5, err_msg=name)
    # Updated parameters agree too (gradient all-reduce correctness).
    for a, b in zip(jax.tree.leaves(s1.d_params),
                    jax.tree.leaves(s8.d_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_sharded_batch_layout():
    mesh = make_mesh(8)
    x = np.zeros((16, 10), np.float32)
    sx = shard_batch(mesh, x)
    assert sx.sharding.is_equivalent_to(batch_sharding(mesh), ndim=2)
    # each device holds 2 examples
    assert sx.addressable_shards[0].data.shape == (2, 10)


def test_multi_step_training_on_mesh():
    """Donated-state multi-step run on the 8-device mesh executes and stays
    finite (the dryrun_multichip path)."""
    settings, state, step, batch = _setup()
    mesh = make_mesh(8)
    stepj = jit_data_parallel(step, mesh)
    b = shard_batch(mesh, *batch)
    key = jax.random.key(0)
    for i in range(3):
        key, sub = jax.random.split(key)
        state, metrics = stepj(state, *b, sub)
    assert np.isfinite(float(metrics["d_total_loss"]))
    assert int(state.step) == 3
