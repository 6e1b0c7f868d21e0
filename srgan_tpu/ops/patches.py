"""Random patch extraction + normalization for crowd training batches.

Reference: crowd/data.py transform classes (random patch selection,
horizontal flip, mean/std normalization, numpy→tensor) [A][H] — per-sample
Python/PIL work in DataLoader workers in the reference; here the transform
runs ON the TPU as a Pallas kernel + fused XLA tail (BASELINE.json north
star).

Design (shaped by Mosaic's memory tiling):
* A Pallas kernel does the bandwidth-critical part: for each example it
  DMAs only the P needed image rows HBM→VMEM (dynamic sublane offset,
  full lanes — reads P/H of the image instead of all of it) and applies
  the affine normalization on the VPU. Per-example row offsets arrive as
  scalar-prefetch operands; the grid pipeline double-buffers the DMAs.
* The x-window (a *lane-dimension* dynamic slice, which Mosaic only allows
  at 128-aligned offsets) and the horizontal flip (`rev` has no Mosaic
  lowering) are done by the XLA wrapper with a vmapped
  ``lax.dynamic_slice`` + masked select over the kernel's [B, P, W, C]
  output — XLA emits its own rotate/mask code for those and fuses them, so
  the whole transform still executes on device with no host round-trip.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


_LANE = 128   # lane tile: flattened row length must be a multiple


def _sublane_for(dtype) -> int:
    """Sublane tile (row-alignment requirement for DMA offsets) by item
    size: f32 → 8 rows, bf16 → 16, u8/i8 → 32."""
    return {4: 8, 2: 16, 1: 32}[np.dtype(dtype).itemsize]


def padded_row_length(width: int, channels: int) -> int:
    """Lane-padded W*C — store datasets at this row length to make the
    per-call pad in :func:`extract_patches` free."""
    return -(-(width * channels) // _LANE) * _LANE


def _make_rows_kernel(sublane: int):
    """One example per grid step: DMA P+sublane rows from an aligned base,
    normalize.

    Mosaic requires the sublane (row) DMA offset to be tile-aligned
    (8 rows for f32, 32 for u8), so the kernel reads from ``align(oy)`` —
    clamped so the window stays in bounds — and the XLA tail slices off
    the sub-tile remainder along with the x-window.

    offsets_ref: SMEM scalar-prefetch [B, 3] int32 (src_idx, aligned_oy, ox)
    images_ref:  HBM [N, H, W*C] — the whole dataset may live here; src_idx
                 gathers the example, so random patch sampling never copies
                 a full image out of HBM
    scale_ref/shift_ref: SMEM (1, 1) float32 — out = x * scale + shift
    out_ref:     VMEM [1, P + sublane, W*C] float32
    scratch_ref: VMEM [P + sublane, W*C] (input dtype)
    """

    def kernel(offsets_ref, images_ref, scale_ref, shift_ref,
               out_ref, scratch_ref, sem_ref):
        i = pl.program_id(0)
        rows = out_ref.shape[1]
        src = offsets_ref[i, 0]
        # Wrapper guarantees alignment; Mosaic needs the hint to prove it.
        base = pl.multiple_of(offsets_ref[i, 1], sublane)
        dma = pltpu.make_async_copy(
            images_ref.at[src, pl.ds(base, rows), :], scratch_ref, sem_ref)
        dma.start()
        dma.wait()
        if scratch_ref.dtype == jnp.uint8:
            # Mosaic has no unsigned casts: reinterpret as i8 and undo the
            # two's-complement wrap (192u8 → -64i8 → +256 → 192.0).
            signed = pltpu.bitcast(scratch_ref[:],
                                   jnp.int8).astype(jnp.float32)
            x = jnp.where(signed < 0, signed + 256.0, signed)
        else:
            x = scratch_ref[:].astype(jnp.float32)
        out_ref[0] = x * scale_ref[0, 0] + shift_ref[0, 0]

    return kernel


def _normalized_rows(images: jax.Array, indices: jax.Array, oy: jax.Array,
                     *, window: int, scale: float, shift: float,
                     interpret: bool):
    """Shared Pallas row extraction: per-example normalized row bands.

    For each output example, DMA ``window + sublane`` image rows from an
    aligned base covering ``[oy, oy + window)`` HBM→VMEM and apply the
    affine normalization. Returns ``(rows [B, window+sublane, W, C] f32,
    dy [B] int32)`` where the wanted band starts at row ``dy``.
    """
    n, h, w, c = images.shape
    sublane = _sublane_for(images.dtype)
    rows_out = window + sublane
    # The kernel promises Mosaic a sublane-aligned DMA base
    # (`pl.multiple_of`). The clamped base `h_eff - rows_out` is only
    # aligned when (h - window) is a sublane multiple; otherwise pad H so
    # the unclamped floor-aligned base is always in bounds. (A false
    # alignment hint would mis-DMA on real TPUs — CPU interpret mode
    # can't catch it.) Store datasets with (H - window) % sublane == 0 to
    # make the pad free.
    pad_h = (sublane - (h - window) % sublane) % sublane
    h_eff = h + pad_h
    if h_eff < rows_out:
        raise ValueError(f"image height {h} must be ≥ window + "
                         f"{sublane} = {rows_out} for dtype "
                         f"{images.dtype}")
    # The HBM row DMA takes full lanes, so the flattened row length W*C
    # must be a lane-tile multiple; pad once here (store datasets
    # pre-padded via `padded_row_length` to make this a no-op).
    wc = w * c
    wc_padded = -(-wc // _LANE) * _LANE
    indices = indices.astype(jnp.int32)
    b = indices.shape[0]
    oy = oy.astype(jnp.int32)
    # Both candidates are sublane multiples: the floor-alignment by
    # construction, the clamp bound because pad_h was chosen to make
    # h_eff - rows_out = floor_align(h - window) (pad case) or
    # h - window - sublane with (h - window) % sublane == 0 (no-pad case).
    aligned_oy = jnp.minimum((oy // sublane) * sublane, h_eff - rows_out)
    dy = oy - aligned_oy  # ∈ [0, sublane]
    kernel_offsets = jnp.stack([indices, aligned_oy,
                                jnp.zeros_like(indices)], axis=1)
    scale_arr = jnp.full((1, 1), scale, jnp.float32)
    shift_arr = jnp.full((1, 1), shift, jnp.float32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[
            # Full images must stay HBM-resident; only the row window
            # ever reaches VMEM.
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, rows_out, wc_padded),
                               lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((rows_out, wc_padded), images.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    flat = images.reshape(n, h, wc)
    if wc_padded != wc or pad_h:
        flat = jnp.pad(flat, ((0, 0), (0, pad_h), (0, wc_padded - wc)))
    rows = pl.pallas_call(
        _make_rows_kernel(sublane),
        out_shape=jax.ShapeDtypeStruct((b, rows_out, wc_padded),
                                       jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(kernel_offsets, flat, scale_arr, shift_arr)
    return rows[:, :, :wc].reshape(b, rows_out, w, c), dy


def _apply_flips(patches: jax.Array, flips: jax.Array) -> jax.Array:
    flipped = jnp.flip(patches, axis=2)
    do_flip = (flips.astype(jnp.int32) == 1)[:, None, None, None]
    return jnp.where(do_flip, flipped, patches)


@functools.partial(jax.jit,
                   static_argnames=("patch_size", "interpret"))
def extract_patches(images: jax.Array, offsets: jax.Array,
                    flips: jax.Array, *, patch_size: int,
                    scale: float = 1.0, shift: float = 0.0,
                    indices: jax.Array | None = None,
                    interpret: bool = False) -> jax.Array:
    """Extract per-example patches with flip + affine normalization.

    Args:
      images:  [N, H, W, C] (any float/int dtype; HBM-resident). With
        ``indices`` given this is the WHOLE dataset and the kernel gathers
        source images per output example (the on-device input queue:
        sampling never copies a full image out of HBM).
      offsets: [B, 2] int32 top-left (y, x); caller guarantees in-bounds.
      flips:   [B] int32/bool horizontal-flip flags.
      patch_size: static patch side P.
      scale, shift: ``out = x * scale + shift`` (e.g. scale=2/255, shift=-1
        for the reference's [-1, 1] image normalization).
      indices: optional [B] int32 source-image index per output example;
        defaults to ``arange(N)`` (B == N).

    Returns: [B, P, P, C] float32.
    """
    # The Mosaic kernel only exists for TPU; on CPU backends (tests,
    # multi-chip dry runs on virtual devices) fall back to the interpreter.
    interpret = interpret or jax.default_backend() == "cpu"
    n, h, w, c = images.shape
    p = patch_size
    offsets = offsets.astype(jnp.int32)
    if indices is None:
        indices = jnp.arange(n, dtype=jnp.int32)
    oy, ox = offsets[:, 0], offsets[:, 1]
    rows, dy = _normalized_rows(images, indices, oy, window=p,
                                scale=scale, shift=shift,
                                interpret=interpret)

    def yx_window(row_img: jax.Array, dy_i: jax.Array, ox_i: jax.Array
                  ) -> jax.Array:
        return jax.lax.dynamic_slice(row_img, (dy_i, ox_i, 0), (p, p, c))

    patches = jax.vmap(yx_window)(rows, dy, ox)
    return _apply_flips(patches, flips)


@functools.partial(jax.jit,
                   static_argnames=("patch_size", "window_sizes",
                                    "preserve_mass", "interpret"))
def extract_rescaled_patches(images: jax.Array, offsets: jax.Array,
                             flips: jax.Array, scale_idx: jax.Array, *,
                             patch_size: int,
                             window_sizes: tuple[int, ...],
                             scale: float = 1.0, shift: float = 0.0,
                             preserve_mass: bool = False,
                             indices: jax.Array | None = None,
                             interpret: bool = False) -> jax.Array:
    """Random-rescale patch extraction: per-example source windows of
    size ``window_sizes[scale_idx[i]]`` are bilinearly resized to
    ``patch_size`` (reference: crowd random patch selection "+rescale",
    SURVEY.md §2 6c [A][H]; the exact scale set is provisional).

    One Pallas row DMA per example covers the LARGEST window; each static
    window size then slices + resizes its candidate and the per-example
    ``scale_idx`` selects among them — shapes stay static for XLA, the
    extra work is |window_sizes| small resizes on already-VMEM-resident
    rows.

    Args:
      offsets: [B, 2] int32 (y, x); caller guarantees
        ``0 ≤ o ≤ dim - window_sizes[scale_idx]`` per example.
      scale_idx: [B] int32 index into ``window_sizes``.
      window_sizes: static tuple of source window sides, e.g. ``(168,
        224, 280)`` for ±25% around a 224 patch.
      preserve_mass: renormalize values by ``(window / patch_size)**2`` so
        each patch's integral (density mass = head count in the window)
        is preserved under resize.

    Returns: [B, P, P, C] float32.
    """
    interpret = interpret or jax.default_backend() == "cpu"
    n, h, w, c = images.shape
    p = patch_size
    wmax = max(window_sizes)
    if min(window_sizes) < 1:
        raise ValueError(f"window_sizes must be ≥ 1, got {window_sizes}")
    if wmax > min(h, w):
        raise ValueError(f"largest rescale window {wmax} exceeds image "
                         f"size {h}x{w}")
    offsets = offsets.astype(jnp.int32)
    if indices is None:
        indices = jnp.arange(n, dtype=jnp.int32)
    oy, ox = offsets[:, 0], offsets[:, 1]
    rows, dy = _normalized_rows(images, indices, oy, window=wmax,
                                scale=scale, shift=shift,
                                interpret=interpret)
    scale_idx = scale_idx.astype(jnp.int32)
    candidates = []
    for ws in window_sizes:
        def yx_window(row_img, dy_i, ox_i, ws=ws):
            # Clamped for examples whose own window differs; those slices
            # are discarded by the scale_idx select below.
            return jax.lax.dynamic_slice(row_img, (dy_i, ox_i, 0),
                                         (ws, ws, c))

        win = jax.vmap(yx_window)(rows, dy, ox)
        resized = jax.image.resize(win, (win.shape[0], p, p, c),
                                   method="bilinear")
        if preserve_mass:
            resized = resized * ((ws / p) ** 2)
        candidates.append(resized)
    # One-hot select (|window_sizes| is small; cheaper than gather over a
    # stacked [S, B, P, P, C]).
    onehot = jax.nn.one_hot(scale_idx, len(window_sizes),
                            dtype=jnp.float32)  # [B, S]
    out = sum(cand * onehot[:, i, None, None, None]
              for i, cand in enumerate(candidates))
    return _apply_flips(out, flips)


def extract_rescaled_patches_reference(images: np.ndarray,
                                       offsets: np.ndarray,
                                       flips: np.ndarray,
                                       scale_idx: np.ndarray,
                                       patch_size: int,
                                       window_sizes: tuple,
                                       scale: float = 1.0,
                                       shift: float = 0.0,
                                       preserve_mass: bool = False,
                                       indices: np.ndarray | None = None
                                       ) -> np.ndarray:
    """Golden model for :func:`extract_rescaled_patches`.

    Per-example NumPy crop → resize → mass renorm → flip. The resize
    primitive itself is ``jax.image.resize`` (shared with the device
    path — the independently-modeled logic is the window geometry,
    per-example scale select, mass renormalization and flip; modeling
    jax's anti-aliased resampler in NumPy would test the library, not
    this module).
    """
    if indices is None:
        indices = np.arange(images.shape[0])
    b = len(indices)
    p = patch_size
    c = images.shape[3]
    out = np.empty((b, p, p, c), np.float32)
    for i in range(b):
        ws = int(window_sizes[int(scale_idx[i])])
        oy, ox = int(offsets[i, 0]), int(offsets[i, 1])
        win = images[int(indices[i]),
                     oy:oy + ws, ox:ox + ws].astype(np.float32)
        win = win * scale + shift
        resized = np.asarray(jax.image.resize(
            jnp.asarray(win), (p, p, c), method="bilinear"))
        if preserve_mass:
            resized = resized * ((ws / p) ** 2)
        if flips[i]:
            resized = resized[:, ::-1]
        out[i] = resized
    return out


def extract_patches_reference(images: np.ndarray, offsets: np.ndarray,
                              flips: np.ndarray, patch_size: int,
                              scale: float = 1.0, shift: float = 0.0,
                              indices: np.ndarray | None = None
                              ) -> np.ndarray:
    """NumPy golden model for the kernel tests (SURVEY.md §4)."""
    if indices is None:
        indices = np.arange(images.shape[0])
    b = len(indices)
    p = patch_size
    out = np.empty((b, p, p, images.shape[3]), np.float32)
    for i in range(b):
        oy, ox = int(offsets[i, 0]), int(offsets[i, 1])
        patch = images[int(indices[i]),
                       oy:oy + p, ox:ox + p].astype(np.float32)
        if flips[i]:
            patch = patch[:, ::-1]
        out[i] = patch * scale + shift
    return out
