"""Mixture-of-distributions sampling.

Reference: utility.py (MixtureModel(rv_continuous)) [H] — used to (a) draw
the generator's latent z from a 2-component normal mixture at ±mean_offset
and (b) offset the unlabeled/fake data populations in the coefficient toy.

Two implementations:
* :class:`MixtureModel` — NumPy/scipy host-side mixture (data generation).
* :func:`sample_offset_normal` — JAX device-side equivalent for the z-draws
  inside the jitted train step (equal-weight ±offset normal mixture).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


class MixtureModel:
    """Equal-weight mixture of scipy frozen distributions.

    ``MixtureModel([norm(-offset, 1), norm(offset, 1)]).rvs(shape, rng)``
    mirrors the reference's ``rv_continuous`` subclass without paying
    scipy's generic inverse-CDF sampling cost.
    """

    def __init__(self, submodels: Sequence, weights: Sequence[float] = None):
        self.submodels = list(submodels)
        n = len(self.submodels)
        if weights is None:
            weights = [1.0 / n] * n
        total = float(sum(weights))
        self.weights = [w / total for w in weights]

    def rvs(self, size, random_state: np.random.Generator = None) -> np.ndarray:
        rng = random_state or np.random.default_rng()
        size = tuple(np.atleast_1d(size))
        choices = rng.choice(len(self.submodels), size=size, p=self.weights)
        out = np.empty(size, dtype=np.float64)
        for idx, sub in enumerate(self.submodels):
            mask = choices == idx
            count = int(mask.sum())
            if count:
                out[mask] = sub.rvs(size=count, random_state=rng)
        return out

    def pdf(self, x) -> np.ndarray:
        return sum(w * m.pdf(x) for w, m in zip(self.weights, self.submodels))


def sample_offset_normal(key: jax.Array, shape, mean_offset: float,
                         dtype=jnp.float32) -> jax.Array:
    """z ~ equal mixture of N(−offset·1, I) and N(+offset·1, I), per example.

    Device-side equivalent of the reference's latent-noise MixtureModel draw
    (srgan.py z sampling [H]); offset 0 reduces exactly to N(0, I). The
    component choice is per-example (axis 0) as in the reference.
    """
    k_norm, k_sign = jax.random.split(key)
    z = jax.random.normal(k_norm, shape, dtype=dtype)
    if mean_offset == 0.0:
        return z
    sign = jax.random.rademacher(
        k_sign, (shape[0],) + (1,) * (len(shape) - 1), dtype=dtype)
    return z + sign * jnp.asarray(mean_offset, dtype)
