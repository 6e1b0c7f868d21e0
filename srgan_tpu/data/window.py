"""Dataset-scale double-buffered HBM input queue (the "window tier").

The crowd HBM-resident input path (SURVEY.md §2 6c; apps/crowd.py) keeps
whole training splits in device HBM and samples augmented patches from
them with a Pallas kernel at full step rate. Real native-resolution tile
databases (UCF-QNRF at --mode tiles: ~20-30 GB) exceed a single chip's
HBM, and the only fallback was the host-streaming tier — an order of
magnitude slower on a 1-core host (BASELINE.md round 4: 73.8 vs 806
img/s). This module is the missing middle tier:

- A **window** of W examples of a split stays resident in HBM as one
  buffer per source array (images / stacked labels), so the existing
  Pallas sampler runs UNCHANGED at full speed — it just indexes [0, W).
- The window is divided into S **slices** of R = W/S examples. A
  host-side cursor walks an endless, seeded, per-pass-reshuffled stream
  of the full split (every example enters the window exactly once per
  pass — no starvation bias; tests/test_window.py pins this).
- Each refresh replaces the oldest slice via a **donated**
  ``lax.dynamic_update_slice`` jit (in-place in HBM — no 2× window), with
  the next slice staged a full refresh ahead by ``jax.device_put`` on a
  background thread: the host→HBM DMA overlaps training compute
  (the same async discipline as checkpoint.py / data/core.py).
- ``refresh_period=0`` (auto) is **opportunistic**: a slice is applied at
  the first step boundary after its transfer completes, so training never
  blocks on input IO — throughput stays at the HBM-resident ceiling and
  the rotation rate degrades gracefully to the measured host→device
  bandwidth (this machine's remote-TPU tunnel: ~25 MB/s; a real TPU host
  PCIe: GB/s). An explicit ``refresh_period=k`` gives a deterministic
  schedule (content at step t is a pure function of the seed), blocking
  on the DMA if IO cannot keep up.
- Composes with ``crowd_shard_dataset`` (multi-chip): each data-parallel
  shard holds W/d window rows; every drawn slice is distributed
  shard-major (block s of the slice fills shard s's rows), refresh
  slices are device_put with batch sharding and the update runs under
  ``shard_map`` at a shard-local offset, so the DMA and the in-place
  update both stay local — no cross-device traffic. One GLOBAL
  per-pass-reshuffled stream feeds all shards (the shard an example
  lands on varies pass to pass), so every example is resident — and
  sampled — with identical frequency even when the split size does not
  divide by the shard count (fixed per-shard blocks would over-weight
  examples in the smaller blocks, the same bias ``shard_local_counts``
  corrects on the non-windowed path).

Reference parity note: the reference's answer to larger-than-RAM data is
torch DataLoader worker processes re-reading from disk every batch
(SURVEY.md §3.1 [H]). This tier is the TPU-native redesign: batches are
*sampled in HBM* at device speed while the dataset *rotates through* HBM
at IO speed, decoupling step rate from input bandwidth.
"""

from __future__ import annotations

import concurrent.futures
import queue
import threading
from typing import Callable, Dict, Optional, Sequence

import numpy as np


class _DaemonStager:
    """Single daemon worker thread with a Future-returning ``submit``.

    ``concurrent.futures.ThreadPoolExecutor`` workers are non-daemon and
    joined at interpreter exit — and a window keeps one staged transfer
    in flight at all times by design, so exit would always block on an
    unneeded slice ``device_put`` (seconds per split at the remote-TPU
    tunnel's ~25 MB/s, unbounded during its documented hangs — CLAUDE.md),
    including on crash paths where the result is never used. A daemon
    thread lets the process exit with the in-flight transfer abandoned.
    """

    def __init__(self, name: str):
        self._queue: "queue.SimpleQueue" = queue.SimpleQueue()
        self._thread = threading.Thread(
            target=self._run, name=name, daemon=True)
        self._thread.start()

    def submit(self, fn: Callable) -> concurrent.futures.Future:
        future: concurrent.futures.Future = concurrent.futures.Future()
        self._queue.put((fn, future))
        return future

    def _run(self) -> None:
        while True:
            item = self._queue.get()
            if item is None:
                return
            fn, future = item
            if not future.set_running_or_notify_cancel():
                continue
            try:
                future.set_result(fn())
            except BaseException as exc:  # delivered via Future.result()
                future.set_exception(exc)

    def shutdown(self) -> None:
        """Stop accepting work and end the worker once the queue drains
        (never joins — the thread is daemon, so exit never blocks)."""
        self._queue.put(None)


def slice_update_factory(mesh=None, sharded: bool = False):
    """``make_update`` builder for :class:`HBMWindow`: a donated in-place
    ``dynamic_update_slice`` jit matching the window's sharding.

    ``sharded=True`` runs the update under ``shard_map`` at a shard-LOCAL
    offset (each data shard updates its own window block — no
    cross-device traffic). Only the window buffer (arg 0) is donated —
    it aliases the same-shaped output, so the update is in-place in HBM;
    the slice has no matching output and cannot alias. Donation is
    requested only on TPU: the CPU backend cannot alias these buffers
    and would warn on every refresh.
    """
    import jax

    donate = (0,) if jax.default_backend() == "tpu" else ()

    def body(buf, sl, off):
        return jax.lax.dynamic_update_slice(
            buf, sl, (off,) + (0,) * (buf.ndim - 1))

    if sharded:
        from jax.sharding import PartitionSpec as P

        from srgan_tpu.parallel.mesh import shard_map_fn

        def make_update(_name):
            fn = shard_map_fn(body, mesh=mesh,
                              in_specs=(P("data"), P("data"), P()),
                              out_specs=P("data"))
            return jax.jit(fn, donate_argnums=donate)
    else:
        def make_update(_name):
            kwargs = {}
            if mesh is not None:
                from srgan_tpu.parallel.mesh import replicated_sharding
                kwargs["out_shardings"] = replicated_sharding(mesh)
            return jax.jit(body, donate_argnums=donate, **kwargs)

    return make_update


class SliceStream:
    """Deterministic endless stream of fixed-size id slices covering a
    split.

    Pass p is a fresh seeded permutation of all ``num_examples`` ids
    (``default_rng([seed, pass])``); slices of ``slice_size`` are cut
    contiguously across pass boundaries, so every example appears exactly
    once per pass regardless of divisibility.
    """

    def __init__(self, num_examples: int, slice_size: int, seed):
        if num_examples < 1:
            raise ValueError("SliceStream needs at least one example")
        if slice_size < 1:
            raise ValueError("slice_size must be >= 1")
        self.num_examples = int(num_examples)
        self.slice_size = int(slice_size)
        self._seed = list(np.atleast_1d(np.asarray(seed, np.int64)))
        self._pass_index = 0
        self._pending = np.empty((0,), np.int64)

    def next_ids(self) -> np.ndarray:
        """The next ``slice_size`` example ids (always full-size)."""
        while len(self._pending) < self.slice_size:
            rng = np.random.default_rng(self._seed + [self._pass_index])
            order = rng.permutation(self.num_examples)
            self._pending = np.concatenate([self._pending, order])
            self._pass_index += 1
        ids, self._pending = (self._pending[:self.slice_size],
                              self._pending[self.slice_size:])
        return ids.astype(np.int64)


class HBMWindow:
    """One training split's rotating HBM-resident window.

    Parameters
    ----------
    names / sources:
        Parallel lists: ``sources[i](host_ids)`` returns the host array
        rows for those example ids (shape ``[len(ids), ...]``, final
        upload dtype). ``names[i]`` keys the device buffer in
        :attr:`arrays` (e.g. ``"labeled_images"``).
    num_examples / num_shards:
        Split size and data-parallel shard count. One global per-pass
        stream covers all ``num_examples`` ids; each drawn slice is laid
        out shard-major (block s fills shard s's window rows), so every
        example enters the window with identical frequency regardless of
        ``num_examples % num_shards``.
    window / num_slices:
        W resident examples in ``num_slices`` slices of R = W/S. W must
        divide by S, and R and W by the shard count.
    put:
        ``put(host_array) -> jax.Array`` with the window's sharding
        (replicated, or batch-sharded over 'data').
    make_update:
        ``make_update(example) -> fn(buffer, slice, local_offset)`` — a
        donated in-place slice update matching the window's sharding
        (plain jit, or shard_map at a shard-local offset).
    refresh_period:
        0 = opportunistic (apply when the staged DMA is done; never
        blocks). k > 0 = deterministic boundary every k steps (blocks on
        the DMA if IO is slower).
    """

    def __init__(self, names: Sequence[str],
                 sources: Sequence[Callable[[np.ndarray], np.ndarray]],
                 num_examples: int, window: int, num_slices: int, *,
                 seed, put: Callable, make_update: Callable,
                 refresh_period: int = 0, num_shards: int = 1):
        if len(names) != len(sources):
            raise ValueError("names and sources must be parallel")
        d = int(num_shards)
        if num_slices < 1:
            raise ValueError(
                f"crowd_window_slices={num_slices} must be positive")
        if window % num_slices:
            raise ValueError(
                f"crowd_hbm_window={window} must divide by "
                f"crowd_window_slices={num_slices}")
        slice_size = window // num_slices
        if window % d or slice_size % d:
            raise ValueError(
                f"crowd_hbm_window={window} and its slice size "
                f"{slice_size} must divide by the data-parallel shard "
                f"count {d}")
        if num_examples < 1:
            raise ValueError("cannot window an empty split")
        self.names = list(names)
        self.window = int(window)
        self.num_slices = int(num_slices)
        self.slice_size = slice_size
        self._sources = list(sources)
        self.num_examples = int(num_examples)
        self._d = d
        self._w_local = window // d          # window rows per shard
        self._r_local = slice_size // d      # slice rows per shard
        self._put = put
        self._updates = [make_update(name) for name in names]
        self.refresh_period = int(refresh_period)
        # ONE global deterministic rotation stream over host example ids;
        # each drawn slice is split shard-major, so per-example residency
        # frequency is exactly once per pass for every shard count.
        self._stream = SliceStream(num_examples, slice_size, seed)
        # Which host example id sits in each window row (shard-major
        # layout: shard s owns window rows [s*w_local, (s+1)*w_local)).
        self._resident = np.empty(window, np.int64)
        self.refresh_count = 0
        self._next_slot = 0
        self._stager = _DaemonStager("hbm-window")
        self._staged: Optional[concurrent.futures.Future] = None
        self._last_boundary = -1
        self._fill_initial()
        self._stage_next()

    # ------------------------------------------------------------- plumbing
    def _draw_slice_ids(self) -> np.ndarray:
        """[slice_size] host example ids, shard-major ([r_local] each)."""
        return self._stream.next_ids()

    def _assemble(self, source, host_ids: np.ndarray) -> np.ndarray:
        return np.ascontiguousarray(source(host_ids))

    def _fill_initial(self) -> None:
        """Upload the first S slices as one [W, ...] put per source."""
        slot_ids = [self._draw_slice_ids() for _ in range(self.num_slices)]
        # Window layout is shard-major; each slice is shard-major too, so
        # window rows for shard s slot k = slice k's block s.
        order = np.empty(self.window, np.int64)
        for k, ids in enumerate(slot_ids):
            for s in range(self._d):
                rows = slice(s * self._w_local + k * self._r_local,
                             s * self._w_local + (k + 1) * self._r_local)
                block = ids[s * self._r_local:(s + 1) * self._r_local]
                order[rows] = block
        self._resident[:] = order
        self.arrays: Dict[str, object] = {
            name: self._put(self._assemble(source, order))
            for name, source in zip(self.names, self._sources)}

    def _stage_next(self) -> None:
        """Kick the background assemble + device_put of the next slice.

        The worker forces transfer COMPLETION with a one-scalar readback
        before reporting ready: ``device_put`` returns as soon as the
        transfer is enqueued (and ``block_until_ready`` returns early
        through remote-TPU tunnels — CLAUDE.md), so without the sync the
        opportunistic mode would apply slices whose DMA is still in
        flight, stalling the device on exactly the IO it must overlap.
        """
        ids = self._draw_slice_ids()

        def work():
            import jax

            out = [self._put(self._assemble(source, ids))
                   for source in self._sources]
            for a in out:
                jax.device_get(a[(0,) * a.ndim])
            return ids, out

        self._staged = self._stager.submit(work)

    def _apply_staged(self) -> None:
        ids, device_slices = self._staged.result()
        slot = self._next_slot
        offset = np.asarray(slot * self._r_local, np.int32)
        for name, update, sl in zip(self.names, self._updates,
                                    device_slices):
            self.arrays[name] = update(self.arrays[name], sl, offset)
        for s in range(self._d):
            rows = slice(s * self._w_local + slot * self._r_local,
                         s * self._w_local + (slot + 1) * self._r_local)
            self._resident[rows] = ids[s * self._r_local:
                                       (s + 1) * self._r_local]
        self._next_slot = (slot + 1) % self.num_slices
        self.refresh_count += 1
        self._stage_next()

    # -------------------------------------------------------------- surface
    def maybe_refresh(self, step: int) -> bool:
        """Refresh hook, called once per training step (or chunk).

        Deterministic mode applies exactly at each period boundary
        (waiting for the DMA if needed). Opportunistic mode applies at
        most one slice per call, only if its transfer already finished.
        Returns True when :attr:`arrays` changed.
        """
        if self.refresh_period > 0:
            if step <= 0 or step % self.refresh_period:
                return False
            if step == self._last_boundary:
                return False  # idempotent within a boundary
            self._last_boundary = step
            self._apply_staged()  # blocks on the DMA if IO lags
            return True
        if self._staged is not None and self._staged.done():
            self._apply_staged()
            return True
        return False

    def resident_ids(self) -> np.ndarray:
        """Host example ids currently resident, by window row (tests)."""
        return self._resident.copy()

    def close(self) -> None:
        self._stager.shutdown()
