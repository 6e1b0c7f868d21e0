"""The capability that names the project: SR-GAN's discriminator beating
the supervised DNN baseline at equal labels.

Round-1 shipped an honest negative (BASELINE.md): at the provisional
hidden_size=10 toy the mapping is near-identifiable and no multiplier
regime helps (confirmed at 16 seeds/64 combos by tools/sweep.py). The win
regime found by the round-2 sweep — an over-parameterized regressor
(hidden 100) overfitting few labels, regularized by the unlabeled
feature-matching stream — replicates with paired t ≈ −2.3 at 24 seeds
(BASELINE.md table) and through the real CoefficientExperiment (7/10
seeds at 4000 steps). This test pins one deterministic instance of that
through the PUBLIC API. (Ref: srgan.py three-stream objective [A],
SURVEY.md §2 component 3 / §6 north star; arXiv:1811.11269.)
"""

import jax
import numpy as np
import pytest

from srgan_tpu.apps.coefficient import CoefficientExperiment
from srgan_tpu.settings import Settings

WIN_REGIME = dict(
    batch_size=32, labeled_dataset_size=16, unlabeled_dataset_size=5000,
    validation_dataset_size=2000, hidden_size=100, learning_rate=1e-4,
    unlabeled_loss_multiplier=0.1, fake_loss_multiplier=1.0,
    gradient_penalty_multiplier=10.0)


@pytest.mark.slow
def test_srgan_beats_dnn_in_the_win_regime(tmp_path):
    steps = 4000
    settings = Settings(
        trial_name="win", logs_directory=str(tmp_path / "logs"),
        steps_to_run=steps, summary_step_period=steps,
        validation_step_period=steps, seed=3, **WIN_REGIME)
    exp = CoefficientExperiment(settings)
    state = exp.train()
    assert int(jax.device_get(state.step)) == steps
    gan_mae = exp.evaluate(use_dnn=False)["MAE"]
    dnn_mae = exp.evaluate(use_dnn=True)["MAE"]
    # Single-core run measured 0.1055 vs 0.1349 (22% margin); require a
    # genuine win, not a tie, so numerical drift can't hollow the test.
    assert np.isfinite(gan_mae) and np.isfinite(dnn_mae)
    assert gan_mae < dnn_mae * 0.97, (
        f"SR-GAN D MAE {gan_mae:.4f} did not beat DNN MAE {dnn_mae:.4f} "
        f"in the pinned win regime")
