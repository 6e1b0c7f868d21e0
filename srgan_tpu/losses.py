"""SR-GAN loss stack, as pure JAX functions.

Re-implements the reference's loss math (SURVEY.md §2 component 3; reference:
srgan.py methods `labeled_loss_calculation`, `unlabeled_loss_calculation`,
`fake_loss_calculation`, `interpolate_loss_calculation`,
`gradient_penalty_calculation`, `generator_loss_calculation` + utility.py
distance/scale helpers [A][H]) as *pure functions* over explicit feature
tensors — no attribute side-channels, no per-stream ``backward()`` calls.
The whole three-stream discriminator objective (including the WGAN-style
gradient penalty, which is a native double differentiation under
``jax.grad``-of-``jax.grad``) lives inside one jitted step; XLA fuses the
elementwise stream math into the surrounding matmuls/convs.

Loss semantics (per SURVEY.md §3.2, the behavioral contract):

* labeled:      mean ``|pred − label|^labeled_loss_order`` on the labeled batch.
* unlabeled:    *feature matching* — norm-distance between the batch-mean
                D-features of the labeled batch and of the unlabeled batch,
                scaled by ``unlabeled_loss_multiplier``.
* fake:         *feature contrasting* — log-scaled NEGATIVE distance pushing
                the fake batch-mean features away from the unlabeled ones,
                scaled by ``fake_loss_multiplier``.
* gradient penalty: ``((‖∇_x interp_loss‖₂ − 1)²).mean()`` at random
                interpolates of unlabeled↔fake inputs, where interp_loss is
                the contrasting loss evaluated at the interpolates, times
                ``gradient_penalty_multiplier``.
* generator:    match fake batch-mean features to unlabeled batch-mean
                features (positive feature distance).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

Array = jax.Array


# --------------------------------------------------------------------------
# Distance / scale helpers (reference: utility.py scale fns [H], names [M]).
# --------------------------------------------------------------------------

def mean_features(features: Array) -> Array:
    """Batch-mean feature vector: [B, F] → [F] (any leading batch dims)."""
    f = features.reshape(features.shape[0], -1)
    return jnp.mean(f, axis=0)


def feature_distance(base_features: Array, other_features: Array,
                     order: float = 2.0,
                     epsilon: float = 1e-12) -> Array:
    """Norm-distance between batch-mean feature vectors.

    ``(Σ_i |mean(base)_i − mean(other)_i|^order)^(1/order)`` — the
    `feature_distance_loss` of the reference (srgan.py / utility.py [H]).
    ``epsilon`` keeps the fractional-power gradient finite at 0.
    """
    diff = jnp.abs(mean_features(base_features) - mean_features(other_features))
    if order == 1.0:
        return jnp.sum(diff)
    if order == 2.0:
        return jnp.sqrt(jnp.sum(jnp.square(diff)) + epsilon)
    return jnp.power(jnp.sum(jnp.power(diff + epsilon, order)), 1.0 / order)


def abs_mean(x: Array) -> Array:
    return jnp.mean(jnp.abs(x))


def square_mean(x: Array) -> Array:
    return jnp.mean(jnp.square(x))


def abs_plus_one_log(x: Array) -> Array:
    """``log(|x| + 1)`` — the log scale used by feature contrasting [H]."""
    return jnp.log(jnp.abs(x) + 1.0)


def abs_plus_one_log_neg(x: Array) -> Array:
    """``−log(|x| + 1)`` — log-scaled negation: grows (toward 0) as the
    distance grows, so minimizing it pushes distributions apart with a
    gradient that decays as 1/(d+1) (SURVEY §2: contrasting log-scaling)."""
    return -abs_plus_one_log(x)


_CONTRASTING_SCALES: dict = {
    "log": abs_plus_one_log_neg,
    "linear": lambda d: -d,
}


def contrasting_scale_fn(name: str) -> Callable[[Array], Array]:
    try:
        return _CONTRASTING_SCALES[name]
    except KeyError:
        raise ValueError(
            f"unknown contrasting_distance_function {name!r}; "
            f"choose from {sorted(_CONTRASTING_SCALES)}") from None


# --------------------------------------------------------------------------
# Loss streams.
# --------------------------------------------------------------------------

def labeled_loss(predictions: Array, labels: Array,
                 order: float = 2.0) -> Array:
    """Supervised regression loss: mean |pred − label|^order.

    Reference: srgan.py (labeled_loss_calculation) [A][H]; order 2 ≡ MSE.
    """
    err = jnp.abs(predictions.astype(jnp.float32)
                  - labels.astype(jnp.float32))
    if order == 2.0:
        return jnp.mean(jnp.square(err))
    if order == 1.0:
        return jnp.mean(err)
    return jnp.mean(jnp.power(err, order))


def unlabeled_loss(labeled_features: Array, unlabeled_features: Array,
                   multiplier: float = 1.0, order: float = 2.0) -> Array:
    """Feature matching between labeled and unlabeled batch-mean features.

    Reference: srgan.py (unlabeled_loss_calculation) [A][H].
    """
    return feature_distance(labeled_features, unlabeled_features,
                            order=order) * multiplier


def fake_loss(unlabeled_features: Array, fake_features: Array,
              multiplier: float = 1.0, order: float = 1.0,
              distance_function: str = "log") -> Array:
    """Feature contrasting: log-scaled NEGATIVE unlabeled↔fake distance.

    Reference: srgan.py (fake_loss_calculation) [A][H]. Minimizing this
    pushes the fake batch-mean features AWAY from the unlabeled ones.
    """
    dist = feature_distance(unlabeled_features, fake_features, order=order)
    return contrasting_scale_fn(distance_function)(dist) * multiplier


def generator_loss(unlabeled_features: Array, fake_features: Array,
                   order: float = 2.0) -> Array:
    """G objective: pull fake batch-mean features TOWARD unlabeled ones.

    Reference: srgan.py (generator_loss_calculation) [A][H].
    """
    return feature_distance(unlabeled_features, fake_features, order=order)


def per_example_gradient_norm(gradients: Array) -> Array:
    """L2 norm of each example's input gradient: [B, ...] → [B]."""
    flat = gradients.reshape(gradients.shape[0], -1).astype(jnp.float32)
    return jnp.sqrt(jnp.sum(jnp.square(flat), axis=1) + 1e-12)


def gradient_penalty(interpolate_gradients: Array,
                     multiplier: float = 10.0) -> Array:
    """WGAN-GP-style penalty ``mean((‖∇‖₂ − 1)²) * multiplier``.

    Reference: srgan.py (gradient_penalty_calculation) [A][H]. The caller
    obtains ``interpolate_gradients`` via ``jax.grad`` of the interpolate
    (contrasting) loss with respect to the interpolated INPUTS — JAX's native
    higher-order differentiation replaces torch's
    ``autograd.grad(..., create_graph=True)``.
    """
    norms = per_example_gradient_norm(interpolate_gradients)
    return jnp.mean(jnp.square(norms - 1.0)) * multiplier


def interpolate_inputs(alpha: Array, unlabeled_examples: Array,
                       fake_examples: Array) -> Array:
    """Per-example convex combination ``α·unlabeled + (1−α)·fake``.

    ``alpha`` has shape [B] (one U[0,1] draw per example); broadcast over
    trailing dims. Reference: srgan.py gradient-penalty interpolates [A][H].
    """
    alpha = alpha.reshape((alpha.shape[0],) + (1,) *
                          (unlabeled_examples.ndim - 1))
    return alpha * unlabeled_examples + (1.0 - alpha) * fake_examples
