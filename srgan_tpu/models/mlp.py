"""Coefficient-application MLPs (the CPU-runnable fidelity config).

Reference: coefficient/models.py (Generator, MLP/Observer) [A][H] — toy MLPs
for the synthetic polynomial-coefficient task (SURVEY.md §2 5a, §3.4).

Design departure from the reference (deliberate, TPU-first): the feature
side-channel is an explicit second return value ``(prediction, features)``
instead of a ``self.features`` attribute mutated during ``forward`` — pure
functions are what ``jax.jit``/``jax.grad`` compose over (SURVEY.md §7).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


class CoefficientGenerator(nn.Module):
    """z → vector of polynomial observations.

    Reference: coefficient/models.py (Generator) [A][H]: small MLP mapping a
    10-d latent to the ~10 noisy observations of one example.
    """
    observation_count: int = 10
    hidden_size: int = 10
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z: jax.Array) -> jax.Array:
        x = z.astype(self.dtype)
        x = nn.leaky_relu(nn.Dense(self.hidden_size, dtype=self.dtype)(x))
        x = nn.leaky_relu(nn.Dense(self.hidden_size, dtype=self.dtype)(x))
        x = nn.Dense(self.observation_count, dtype=self.dtype)(x)
        return x.astype(jnp.float32)


class CoefficientMLP(nn.Module):
    """Observations → coefficient estimate, with explicit features output.

    Reference: coefficient/models.py (MLP a.k.a. Observer) [A][H]. The
    penultimate hidden activations are the `features` consumed by the
    feature-matching/contrasting losses (SURVEY.md §2 component 4).
    """
    hidden_size: int = 10
    output_size: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, observations: jax.Array
                 ) -> Tuple[jax.Array, jax.Array]:
        x = observations.astype(self.dtype)
        x = nn.leaky_relu(nn.Dense(self.hidden_size, dtype=self.dtype)(x))
        x = nn.leaky_relu(nn.Dense(self.hidden_size, dtype=self.dtype)(x))
        features = x
        prediction = nn.Dense(self.output_size, dtype=self.dtype)(features)
        if self.output_size == 1:
            prediction = prediction.squeeze(-1)
        return prediction.astype(jnp.float32), features.astype(jnp.float32)
