"""Synthetic polynomial-coefficient toy data (the fidelity config).

Reference: coefficient/data.py + utility.py (MixtureModel) [H], SURVEY.md
§3.4: sample coefficients from normals (the unlabeled/fake populations are
offset via ``settings.mean_offset`` through a two-component mixture), render
~10 noisy polynomial observations per example; the label is the coefficient.

Exact reference constants could not be read (empty mount); this
reconstruction is deterministic, seedable, and documented so golden traces
can be re-recorded against the real reference later.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
from scipy.stats import norm

from srgan_tpu.data.core import ArrayDataset
from srgan_tpu.settings import Settings
from srgan_tpu.utils.mixture import MixtureModel

OBSERVATION_COUNT = 10
NOISE_SCALE = 0.1


def generate_coefficient_examples(
        count: int, rng: np.random.Generator,
        mean_offset: float = 0.0,
        observation_count: int = OBSERVATION_COUNT
) -> Tuple[np.ndarray, np.ndarray]:
    """Draw coefficients and render noisy polynomial observations.

    coefficient a ~ ½N(−offset,1) + ½N(+offset,1)  (offset 0 → N(0,1));
    observation points x_i: `observation_count` evenly spaced in [−1, 1];
    observations o_i = a·x_i³ + x_i² − a·x_i + ε_i,  ε ~ N(0, 0.1).

    The cubic/linear terms carry the coefficient (odd powers keep the map
    sign-sensitive); the quadratic term is a coefficient-independent
    distractor — estimating a from the 10 noisy values is the regression
    task (reference: coefficient/data.py generation fns [H], constants [M]).
    """
    if mean_offset == 0.0:
        coefficients = rng.standard_normal(count)
    else:
        mixture = MixtureModel([norm(-mean_offset, 1), norm(mean_offset, 1)])
        coefficients = mixture.rvs(count, random_state=rng)
    x = np.linspace(-1.0, 1.0, observation_count)
    clean = (coefficients[:, None] * x[None, :] ** 3
             + x[None, :] ** 2
             - coefficients[:, None] * x[None, :])
    observations = clean + rng.normal(0.0, NOISE_SCALE,
                                      size=(count, observation_count))
    return (observations.astype(np.float32),
            coefficients.astype(np.float32))


def coefficient_datasets(settings: Settings
                         ) -> Tuple[ArrayDataset, ArrayDataset,
                                    ArrayDataset, ArrayDataset]:
    """(labeled_train, unlabeled_train, validation, test) per
    `dataset_setup()`.

    Labeled + validation + test come from the base N(0,1) population; the
    unlabeled population is offset via ``settings.mean_offset``
    (SURVEY.md §3.4).
    """
    rng = np.random.default_rng(settings.seed)
    lab_x, lab_y = generate_coefficient_examples(
        settings.labeled_dataset_size, rng)
    unl_x, _ = generate_coefficient_examples(
        settings.unlabeled_dataset_size, rng,
        mean_offset=settings.mean_offset)
    val_x, val_y = generate_coefficient_examples(
        settings.validation_dataset_size, rng)
    test_x, test_y = generate_coefficient_examples(
        settings.test_dataset_size, rng)
    return (ArrayDataset(lab_x, lab_y), ArrayDataset(unl_x),
            ArrayDataset(val_x, val_y), ArrayDataset(test_x, test_y))
