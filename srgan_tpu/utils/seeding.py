"""Deterministic seeding across host RNGs + JAX key derivation.

Reference: utility.py (seed_all) [H]. JAX's splittable keys replace torch's
global RNG: :func:`experiment_keys` derives independent named keys from one
seed so every stochastic site (data, z-draws, α-draws, init) is reproducible.
"""

from __future__ import annotations

import random
import zlib

import jax
import numpy as np


def seed_all(seed: int = 0) -> None:
    """Seed Python / NumPy global RNGs (host-side data pipelines)."""
    random.seed(seed)
    np.random.seed(seed)


def key_for(seed: int, name: str) -> jax.Array:
    """Derive a named fold of the experiment key, stable across processes
    (crc32, NOT Python ``hash()`` — the builtin is salted per process and
    silently breaks run-to-run reproducibility)."""
    return jax.random.fold_in(jax.random.key(seed),
                              zlib.crc32(name.encode()) % (2 ** 31))


class KeySequence:
    """A stateful stream of fresh JAX PRNG keys for host-side loops.

    The jitted train step itself takes explicit keys; this object only
    sequences them from the host loop — keys never leak global state.
    """

    def __init__(self, seed: int, name: str = "train", start: int = 0):
        self._key = key_for(seed, name)
        if start:
            # Resumed runs (start = restored step) draw a FRESH stream
            # (base key folded by the step) instead of replaying the keys
            # already consumed before the checkpoint.
            self._key = jax.random.fold_in(self._key, start)

    def next(self) -> jax.Array:
        self._key, sub = jax.random.split(self._key)
        return sub

    def take(self) -> jax.Array:
        """Hand the chain key to a jitted program that advances it
        on-device (the chunked train loop splits per scanned step exactly
        as :meth:`next` would); pair with :meth:`restore`."""
        return self._key

    def restore(self, key: jax.Array) -> None:
        """Resume the host-side chain from a key returned by the device."""
        self._key = key
