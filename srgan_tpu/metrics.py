"""Validation metrics: MAE / RMSE / NVE.

Reference: per-epoch MAE/NVE validation scalars (BASELINE.json north star;
srgan.py `validation_summaries` via app subclasses [A][H]).

NVE definition note: the reference mount was unreadable, so NVE is
implemented here as the **normalized vector error** — the mean absolute
error normalized by the standard deviation of the true labels
(``NVE = MAE / std(labels)``), a scale-free error so curves are comparable
across apps. Marked provisional; re-derive from the real source when the
mount is available.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def mae(predictions: Array, labels: Array) -> Array:
    p = predictions.astype(jnp.float32).reshape(-1)
    l = labels.astype(jnp.float32).reshape(-1)
    return jnp.mean(jnp.abs(p - l))


def rmse(predictions: Array, labels: Array) -> Array:
    p = predictions.astype(jnp.float32).reshape(-1)
    l = labels.astype(jnp.float32).reshape(-1)
    return jnp.sqrt(jnp.mean(jnp.square(p - l)))


def nve(predictions: Array, labels: Array, epsilon: float = 1e-8) -> Array:
    """Normalized vector error: MAE / std(labels). Provisional (see module
    docstring)."""
    return mae(predictions, labels) / (jnp.std(
        labels.astype(jnp.float32)) + epsilon)


def count_nae(predicted_counts: Array, true_counts: Array,
              floor: float = 1.0) -> Array:
    """Crowd-counting normalized absolute error:
    mean(|pred − true| / max(true, floor)) (Olmschenk crowd line [M]).

    The denominator floors at 1.0 (the usual crowd-counting convention):
    zero-count frames occur in real splits and in the synthetic database,
    and an ε-floor would let one empty image blow the mean up to ~|pred|/ε.
    """
    p = predicted_counts.astype(jnp.float32).reshape(-1)
    t = true_counts.astype(jnp.float32).reshape(-1)
    return jnp.mean(jnp.abs(p - t) / jnp.maximum(t, floor))
