"""Host-side dataset containers and batch iteration.

Replaces the reference's ``torch.utils.data.Dataset`` + DataLoader worker
processes (SURVEY.md §2 component 6, §3.1: the only multiprocess aspect of
the reference) with a TPU-idiomatic pipeline: static-shape NumPy batches on
the host, an async double-buffered ``device_put`` tail
(:func:`prefetch_to_device`) so the next batch's host→HBM transfer overlaps
the current jitted step, and (for crowd) Pallas kernels doing the per-batch
augmentation ON device (srgan_tpu/ops/).
"""

from __future__ import annotations

import collections
import itertools
from typing import Iterable, Iterator, Optional, Sequence, Tuple

import jax
import numpy as np


class ArrayDataset:
    """In-memory dataset of parallel arrays (examples [+ labels]).

    The reference's per-app ``Dataset`` subclasses reduce to this once
    preprocessing is offline (SURVEY.md §3.3): indexable fixed-shape arrays.
    """

    def __init__(self, examples: np.ndarray,
                 labels: Optional[np.ndarray] = None):
        self.examples = np.asarray(examples)
        self.labels = None if labels is None else np.asarray(labels)
        if self.labels is not None:
            assert len(self.examples) == len(self.labels)

    def __len__(self) -> int:
        return len(self.examples)

    def subset(self, indices) -> "ArrayDataset":
        return ArrayDataset(
            self.examples[indices],
            None if self.labels is None else self.labels[indices])


def epoch_batches(dataset: ArrayDataset, batch_size: int,
                  rng: np.random.Generator, shuffle: bool = True,
                  drop_last: bool = True
                  ) -> Iterator[Tuple[np.ndarray, ...]]:
    """One shuffled epoch of static-shape batches (drop_last keeps shapes
    static for jit — SURVEY.md §7 design stance).

    Datasets smaller than one batch — SR-GAN's core small-labeled-set
    regime — yield a single batch sampled with replacement instead of
    nothing (an empty epoch would stall the training loop forever).
    """
    n = len(dataset)
    if n == 0:
        raise ValueError("cannot batch an empty dataset")
    if n < batch_size:
        idx = rng.choice(n, size=batch_size, replace=True)
        if dataset.labels is None:
            yield (dataset.examples[idx],)
        else:
            yield dataset.examples[idx], dataset.labels[idx]
        return
    order = rng.permutation(n) if shuffle else np.arange(n)
    limit = (n // batch_size) * batch_size if drop_last else n
    for start in range(0, limit, batch_size):
        idx = order[start:start + batch_size]
        if dataset.labels is None:
            yield (dataset.examples[idx],)
        else:
            yield dataset.examples[idx], dataset.labels[idx]


def cycling_batches(dataset: ArrayDataset, batch_size: int,
                    rng: np.random.Generator
                    ) -> Iterator[Tuple[np.ndarray, ...]]:
    """Endless reshuffled batches — the reference's ``cycle(unlabeled_loader)``
    zip partner (SURVEY.md §3.2)."""
    while True:
        yield from epoch_batches(dataset, batch_size, rng)


def prefetch_to_device(iterator: Iterable, sharding=None,
                       size: int = 2) -> Iterator:
    """Double-buffered host→device prefetch.

    Keeps ``size`` batches in flight: ``jax.device_put`` is async, so the
    DMA of batch k+1 overlaps step k's compute — the host never blocks the
    TPU on input (SURVEY.md §7 layer 6).
    """
    queue = collections.deque()

    def put(batch):
        if sharding is None:
            return jax.tree.map(jax.device_put, batch)
        return jax.tree.map(lambda a: jax.device_put(a, sharding), batch)

    it = iter(iterator)
    for batch in itertools.islice(it, size):
        queue.append(put(batch))
    while queue:
        yield queue.popleft()
        for batch in itertools.islice(it, 1):
            queue.append(put(batch))
