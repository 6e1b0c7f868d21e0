"""End-to-end coefficient SR-GAN trial on CPU (SURVEY.md §4 integration:
loss decrease + checkpoint/restore round-trip + summary output)."""

import glob
import json
import os

import pytest

import jax
import numpy as np

from srgan_tpu import checkpoint
from srgan_tpu.apps.coefficient import CoefficientExperiment
from srgan_tpu.settings import Settings


def _settings(tmp_path, **kw):
    base = dict(trial_name="test", logs_directory=str(tmp_path / "logs"),
                batch_size=16, hidden_size=8, labeled_dataset_size=64,
                unlabeled_dataset_size=256, validation_dataset_size=64,
                steps_to_run=12, summary_step_period=4, learning_rate=1e-3,
                seed=0)
    base.update(kw)
    return Settings(**base)


def test_full_trial_runs_and_writes_summaries(tmp_path):
    settings = _settings(tmp_path)
    exp = CoefficientExperiment(settings)
    state = exp.train()
    assert int(jax.device_get(state.step)) == 12
    # scalar summaries written for both writers
    gan_scalars = os.path.join(exp.trial_directory, "GAN", "scalars.jsonl")
    dnn_scalars = os.path.join(exp.trial_directory, "DNN", "scalars.jsonl")
    assert os.path.exists(gan_scalars) and os.path.exists(dnn_scalars)
    tags = {json.loads(line)["tag"] for line in open(gan_scalars)}
    assert {"d_labeled_loss", "d_unlabeled_loss", "d_fake_loss",
            "d_gradient_penalty", "g_loss",
            "validation/MAE", "validation/NVE"} <= tags
    # checkpoint written
    assert checkpoint.latest_checkpoint(exp.trial_directory) is not None
    # explicit evaluate() path
    result = exp.evaluate()
    assert np.isfinite(result["MAE"]) and np.isfinite(result["NVE"])


def test_periodic_checkpoints(tmp_path):
    """save_step_period writes intermediate checkpoints, and the latest
    one wins on resume."""
    settings = _settings(tmp_path, steps_to_run=6, save_step_period=2)
    exp = CoefficientExperiment(settings)
    exp.train()
    root = os.path.join(exp.trial_directory, "checkpoints")
    steps = sorted(int(name.split("_")[1]) for name in os.listdir(root))
    assert steps == [2, 4, 6]
    latest = checkpoint.latest_checkpoint(exp.trial_directory)
    assert latest.endswith("step_6")


def test_checkpoint_resume_roundtrip(tmp_path):
    settings = _settings(tmp_path, steps_to_run=6)
    exp = CoefficientExperiment(settings)
    state = exp.train()
    ckpt_dir = exp.trial_directory

    # Resume into a new trial from the saved path; runs 6 more steps.
    settings2 = _settings(tmp_path, steps_to_run=12,
                          load_model_path=ckpt_dir)
    exp2 = CoefficientExperiment(settings2)
    state2 = exp2.train()
    assert int(jax.device_get(state2.step)) == 12

    # Restored leaves match the saved ones exactly at load time.
    restored = checkpoint.restore_state(state, ckpt_dir)
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_restore_structure_mismatch_is_actionable(tmp_path):
    """Restoring under different architecture settings (e.g. another
    norm_impl / hidden_size) must fail fast with guidance, not an opaque
    Orbax tree error (ADVICE r2: norm_impl checkpoint portability)."""
    settings = _settings(tmp_path, steps_to_run=2)
    exp = CoefficientExperiment(settings)
    state = exp.train()

    from srgan_tpu.train import init_train_state
    other = CoefficientExperiment(_settings(tmp_path, hidden_size=13))
    other.dataset_setup()
    _, d, g, dnn = other.model_setup()
    template = init_train_state(other.settings, d, g, dnn)
    with pytest.raises(ValueError, match="SAME architecture settings"):
        checkpoint.restore_state(template, exp.trial_directory)


def test_resume_fast_forwards_data_order(tmp_path):
    """Regression (ADVICE r1): a resumed run must not replay the batch
    order it already trained on — host data RNGs fold in the restored
    step."""
    settings = _settings(tmp_path, steps_to_run=4)
    exp = CoefficientExperiment(settings)
    exp.train()
    exp2 = CoefficientExperiment(_settings(
        tmp_path, steps_to_run=8, load_model_path=exp.trial_directory))
    exp2.train()
    assert exp2._start_step == 4  # restored step reached the data seeds

    # The iterator stream genuinely depends on the start step.
    exp3 = CoefficientExperiment(_settings(tmp_path))
    exp3.dataset_setup()
    exp3.prepare_mesh()
    exp3._start_step = 0
    fresh = next(iter(next(exp3.epoch_batch_iterators())))
    exp3._start_step = 4
    resumed = next(iter(next(exp3.epoch_batch_iterators())))
    assert not np.array_equal(np.asarray(fresh[0]), np.asarray(resumed[0]))


def test_count_nae_zero_count_images_bounded():
    """Regression (ADVICE r1): zero-count frames floor the denominator at
    1.0 instead of ε (one empty image must not blow NAE up to ~1e8)."""
    from srgan_tpu.metrics import count_nae
    pred = np.array([5.0, 10.0], np.float32)
    true = np.array([0.0, 10.0], np.float32)
    np.testing.assert_allclose(float(count_nae(pred, true)), 2.5,
                               rtol=1e-6)


def test_test_split_and_mean_offset(tmp_path):
    """test_dataset_size produces a real held-out split usable via
    Experiment.test(); mean_offset shifts the unlabeled population and the
    device z-draw."""
    import jax.numpy as jnp
    from srgan_tpu.data.coefficient import coefficient_datasets
    from srgan_tpu.utils.mixture import sample_offset_normal
    import jax

    settings = _settings(tmp_path, steps_to_run=4, test_dataset_size=40,
                         mean_offset=3.0, unlabeled_dataset_size=512)
    lab, unl, val, test = coefficient_datasets(settings)
    assert len(test) == 40 and test.labels is not None
    # offset mixture: unlabeled observations have larger spread than labeled
    assert unl.examples.std() > 1.5 * lab.examples.std()
    # device-side z mixture is bimodal: |mean| small, E|z| large
    z = sample_offset_normal(jax.random.key(0), (4096, 4), 3.0)
    assert abs(float(jnp.mean(z))) < 0.3
    assert float(jnp.mean(jnp.abs(z))) > 2.0

    exp = CoefficientExperiment(settings)
    exp.train()
    result = exp.test()
    assert np.isfinite(result["MAE"])
    assert len(exp.test_dataset) == 40


def test_labeled_set_smaller_than_batch_terminates(tmp_path):
    """Regression: labeled < batch must sample with replacement, not spin
    forever on an empty epoch (the README quick-start config hits this)."""
    settings = _settings(tmp_path, batch_size=32, labeled_dataset_size=10,
                         steps_to_run=4)
    exp = CoefficientExperiment(settings)
    state = exp.train()
    import jax
    assert int(jax.device_get(state.step)) == 4


def test_training_improves_over_untrained(tmp_path):
    settings = _settings(tmp_path, steps_to_run=300,
                         labeled_dataset_size=128, learning_rate=3e-3,
                         summary_step_period=100)
    exp = CoefficientExperiment(settings)
    exp.train()
    trained = exp.evaluate()
    labels = exp.validation_dataset.labels
    # predicting the mean label scores MAE ≈ E|a| ≈ 0.8 for a~N(0,1)
    naive_mae = float(np.mean(np.abs(labels - labels.mean())))
    assert trained["MAE"] < naive_mae
