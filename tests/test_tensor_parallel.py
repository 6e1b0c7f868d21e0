"""2-D (data × model) mesh tests: channel-sharded params produce the same
training math as single-device (SURVEY.md §4 multi-device strategy)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from srgan_tpu.apps.crowd import CrowdExperiment
from srgan_tpu.parallel.mesh import make_mesh, jit_data_parallel, \
    shard_batch
from srgan_tpu.parallel.tp import (MODEL_AXIS, jit_data_model_parallel,
                                   make_mesh_2d, place_state,
                                   state_shardings)
from srgan_tpu.settings import Settings
from srgan_tpu.train import init_train_state, make_gan_train_step


def _crowd_setup(batch=8):
    settings = Settings(batch_size=batch, image_patch_size=16,
                        model_base_width=16, latent_dimension=16)
    exp = CrowdExperiment(settings)
    models, d, g, dnn = exp.model_setup()
    state = init_train_state(settings, d, g, dnn)
    step = make_gan_train_step(settings, models,
                               labeled_loss_fn=exp.labeled_loss_fn(),
                               latent_shape=(16,))
    rng = np.random.default_rng(0)
    batch_arrays = (
        rng.standard_normal((batch, 16, 16, 3)).astype(np.float32),
        np.abs(rng.standard_normal((batch, 16, 16))).astype(np.float32),
        rng.standard_normal((batch, 16, 16, 3)).astype(np.float32))
    return settings, state, step, batch_arrays


def test_mesh_2d_shapes():
    mesh = make_mesh_2d(4, 2)
    assert mesh.shape == {"data": 4, "model": 2}


def test_state_shardings_rule():
    mesh = make_mesh_2d(4, 2)
    _, state, _, _ = _crowd_setup()
    shardings = state_shardings(state, mesh)
    leaves = jax.tree.leaves_with_path(state)
    shard_leaves = jax.tree.leaves(shardings)
    sharded = 0
    for (path, leaf), sh in zip(leaves, shard_leaves):
        spec = sh.spec
        if len(spec) and spec[-1] == MODEL_AXIS:
            assert leaf.shape[-1] % 2 == 0
            sharded += 1
    assert sharded > 10  # conv kernels + moments actually got sharded


def test_dp_tp_matches_single_device():
    """Same batch + key: (4×2) dp×tp step ≡ 1-device step."""
    settings, state, step, batch_arrays = _crowd_setup()
    key = jax.random.key(3)

    mesh1 = make_mesh(1)
    step1 = jit_data_parallel(step, mesh1, donate_state=False)
    b1 = shard_batch(mesh1, *batch_arrays)
    s1, m1 = step1(state, *b1, key)

    mesh2 = make_mesh_2d(4, 2)
    state2 = place_state(state, mesh2)
    step2 = jit_data_model_parallel(step, mesh2, state2,
                                    donate_state=False)
    from jax.sharding import NamedSharding, PartitionSpec as P
    batch_sh = NamedSharding(mesh2, P("data"))
    b2 = tuple(jax.device_put(a, batch_sh) for a in batch_arrays)
    s2, m2 = step2(state2, *b2, key)

    for name in m1:
        np.testing.assert_allclose(float(m1[name]), float(m2[name]),
                                   rtol=5e-4, atol=5e-5, err_msg=name)
    # Adam's first update is ≈ lr·sign(g): fp-reduction noise on near-zero
    # gradients flips signs, so parameters can differ by up to 2·lr even
    # when the losses/gradients agree — bound by that, don't rtol it.
    lr = settings.learning_rate
    for a, b in zip(jax.tree.leaves(s1.d_params),
                    jax.tree.leaves(s2.d_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2.1 * lr)


def test_multi_step_dp_tp_runs():
    settings, state, step, batch_arrays = _crowd_setup()
    mesh = make_mesh_2d(2, 4)
    state = place_state(state, mesh)
    stepj = jit_data_model_parallel(step, mesh, state)
    from jax.sharding import NamedSharding, PartitionSpec as P
    batch_sh = NamedSharding(mesh, P("data"))
    b = tuple(jax.device_put(a, batch_sh) for a in batch_arrays)
    key = jax.random.key(0)
    for _ in range(2):
        key, sub = jax.random.split(key)
        state, metrics = stepj(state, *b, sub)
    assert np.isfinite(float(metrics["d_total_loss"]))


class TestSettingsLevelTp:
    """Settings.model_parallel_devices: the user-facing tp wiring — a
    full Experiment trial trains/evaluates on a 2-D (data × model) mesh
    and matches the dp-only trial's numerics."""

    def _settings(self, tmp_path, **kw):
        base = dict(trial_name="tpuser",
                    logs_directory=str(tmp_path / "logs"),
                    batch_size=8, steps_to_run=3, summary_step_period=2,
                    labeled_dataset_size=6, unlabeled_dataset_size=8,
                    validation_dataset_size=3,
                    crowd_image_height=80, crowd_image_width=96,
                    image_patch_size=32, crowd_sigma=3.0,
                    model_base_width=8, latent_dimension=16,
                    learning_rate=1e-3, seed=0)
        base.update(kw)
        return Settings(**base)

    def test_crowd_trial_end_to_end(self, tmp_path):
        exp = CrowdExperiment(self._settings(
            tmp_path, model_parallel_devices=2))
        state = exp.train()
        assert exp.mesh.shape == {"data": 4, "model": 2}
        assert int(jax.device_get(state.step)) == 3
        result = exp.evaluate()
        assert np.isfinite(result["MAE"])
        # params actually live CHANNEL-SHARDED (a replicated
        # NamedSharding would also span 8 devices — check the spec)
        specs = [leaf.sharding.spec
                 for leaf in jax.tree.leaves(state.g_params)]
        assert any(len(s) and s[-1] == MODEL_AXIS for s in specs), specs

    def test_first_step_losses_match_dp(self, tmp_path):
        """The tp-wired Experiment's FIRST step reproduces the dp
        trial's loss values (forward + grad math parity through the
        Settings-level wiring; tp-vs-single-device step parity at the
        library level is test_dp_tp_matches_single_device). Multi-step
        param trajectories are NOT comparable across partitionings:
        near-zero grads + Adam's step-1 sign sensitivity amplify fp
        reduction-order differences to lr-scale."""
        import json

        results = {}
        for name, extra in (("dp", {}),
                            ("tp", dict(model_parallel_devices=2,
                                        data_parallel_devices=4))):
            exp = CrowdExperiment(self._settings(
                tmp_path, trial_name=name, steps_to_run=2,
                summary_step_period=1, **extra))
            exp.train()
            scalars = {}
            path = f"{exp.trial_directory}/GAN/scalars.jsonl"
            for line in open(path):
                rec = json.loads(line)
                if rec["step"] == 0 and rec["tag"].endswith("_loss"):
                    scalars[rec["tag"]] = rec["value"]
            assert scalars, path
            results[name] = scalars
        assert results["dp"].keys() == results["tp"].keys()
        for tag, value in results["dp"].items():
            assert results["tp"][tag] == pytest.approx(
                value, rel=1e-3, abs=1e-5), tag

    def test_coefficient_trial_with_tp(self, tmp_path):
        from srgan_tpu.apps import CoefficientExperiment

        exp = CoefficientExperiment(Settings(
            trial_name="tpcoef", logs_directory=str(tmp_path / "logs"),
            batch_size=8, hidden_size=16, steps_to_run=3,
            labeled_dataset_size=16, unlabeled_dataset_size=16,
            validation_dataset_size=8, model_parallel_devices=2))
        state = exp.train()
        assert int(jax.device_get(state.step)) == 3
        assert np.isfinite(exp.evaluate()["MAE"])

    def test_chunked_dispatch_rejected_under_tp(self, tmp_path):
        exp = CrowdExperiment(self._settings(
            tmp_path, model_parallel_devices=2, steps_per_dispatch=2))
        with pytest.raises(ValueError, match="model_parallel"):
            exp.train()

    def test_resume_under_tp(self, tmp_path):
        """Checkpoint → resume with model_parallel_devices: restored
        state lands channel-sharded and training continues."""
        first = CrowdExperiment(self._settings(
            tmp_path, trial_name="tpresume", steps_to_run=2,
            model_parallel_devices=2))
        first.train()
        resumed = CrowdExperiment(self._settings(
            tmp_path, trial_name="tpresume2", steps_to_run=4,
            model_parallel_devices=2,
            load_model_path=first.trial_directory))
        state = resumed.train()
        assert int(jax.device_get(state.step)) == 4
        assert np.isfinite(resumed.evaluate()["MAE"])

    def test_evaluate_only_under_tp(self, tmp_path):
        """prepare_for_evaluation places the restored state with the 2-D
        mesh's shardings (the _place_state path)."""
        trained = CrowdExperiment(self._settings(
            tmp_path, trial_name="tpeval", model_parallel_devices=2))
        trained.train()
        want = trained.evaluate()
        fresh = CrowdExperiment(self._settings(
            tmp_path, trial_name="tpeval", model_parallel_devices=2))
        fresh.prepare_for_evaluation(trained.trial_directory)
        got = fresh.evaluate()
        assert got["MAE"] == pytest.approx(want["MAE"], rel=1e-5)

    def test_age_trial_with_tp(self, tmp_path):
        """The image apps (DCGAN G + conv regressor) run under the
        Settings-level 2-D mesh too."""
        from srgan_tpu.apps.age import AgeExperiment

        exp = AgeExperiment(Settings(
            trial_name="tpage", logs_directory=str(tmp_path / "logs"),
            batch_size=8, steps_to_run=2, summary_step_period=2,
            labeled_dataset_size=8, unlabeled_dataset_size=8,
            validation_dataset_size=4, age_image_size=32,
            model_base_width=8, latent_dimension=16,
            model_parallel_devices=2))
        state = exp.train()
        assert int(jax.device_get(state.step)) == 2
        assert np.isfinite(exp.evaluate()["MAE"])
