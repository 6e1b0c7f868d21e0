"""Gaussian density-map rendering as a Pallas TPU kernel.

Reference: crowd/label_generation.py (generate_density_label) [A][H] — one
normalized Gaussian splat per annotated head; the density map's integral
equals the head count. The reference renders on the host with
NumPy/scipy inside DataLoader workers — the documented input-bound hazard
(SURVEY.md §3.2); here the splat runs ON the TPU (BASELINE.json north star:
preprocessing moves to on-device Pallas kernels).

Design: variable head counts become a fixed-capacity padded head array per
image plus a valid-count scalar (SURVEY.md §7 hard part (d)) — static
shapes for XLA. Each grid step renders one image: a `fori_loop` over head
slots accumulates per-head Gaussians on the VPU ([H, W] resident in VMEM),
each splat normalized to unit mass so truncation at image borders cannot
lose count mass.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _density_kernel(counts_ref, heads_ref, sigma_ref, out_ref):
    """One image per grid step: accumulate normalized Gaussians.

    counts_ref: SMEM scalar-prefetch [B] int32 (valid heads per image)
    heads_ref:  VMEM [1, N, 2] float32 (y, x) positions, padded
    sigma_ref:  SMEM (1, 1) float32
    out_ref:    VMEM [1, H, W] float32
    """
    i = pl.program_id(0)
    count = counts_ref[i]
    sigma = sigma_ref[0, 0]
    h, w = out_ref.shape[1], out_ref.shape[2]
    # Mosaic iota must be integer-typed; cast to f32 for the VPU math.
    yy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0).astype(jnp.float32)
    xx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1).astype(jnp.float32)
    inv_two_sigma_sq = 0.5 / (sigma * sigma)
    max_heads = heads_ref.shape[1]

    def body(j, acc):
        hy = heads_ref[0, j, 0]
        hx = heads_ref[0, j, 1]
        g = jnp.exp(-((yy - hy) ** 2 + (xx - hx) ** 2) * inv_two_sigma_sq)
        # Normalize each splat to unit mass → Σ map == head count even when
        # the Gaussian is clipped by the image border.
        g = g / jnp.maximum(jnp.sum(g), 1e-12)
        return acc + jnp.where(j < count, 1.0, 0.0) * g

    out_ref[0] = jax.lax.fori_loop(0, max_heads, body,
                                   jnp.zeros((h, w), jnp.float32))


@functools.partial(jax.jit,
                   static_argnames=("height", "width", "interpret"))
def density_maps(head_positions: jax.Array, head_counts: jax.Array,
                 sigma: jax.Array | float, *, height: int, width: int,
                 interpret: bool = False) -> jax.Array:
    """Render a batch of Gaussian density maps on device.

    Args:
      head_positions: [B, N, 2] float32 (y, x) padded head coordinates.
      head_counts:    [B] int32 number of valid heads per image.
      sigma:          Gaussian std-dev in pixels (scalar).
      height, width:  static output map size.
      interpret:      run the kernel in interpreter mode (CPU tests).

    Returns: [B, H, W] float32 density maps with Σ map ≈ head count.
    """
    # CPU backends (tests, virtual-device dry runs) use the interpreter.
    interpret = interpret or jax.default_backend() == "cpu"
    b, n, _ = head_positions.shape
    sigma_arr = jnp.full((1, 1), sigma, jnp.float32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n, 2), lambda i, counts: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, height, width),
                               lambda i, counts: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        _density_kernel,
        out_shape=jax.ShapeDtypeStruct((b, height, width), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(head_counts.astype(jnp.int32),
      head_positions.astype(jnp.float32), sigma_arr)


def density_maps_reference(head_positions: np.ndarray,
                           head_counts: np.ndarray, sigma: float,
                           height: int, width: int) -> np.ndarray:
    """NumPy reference implementation (the reference repo's host-side math;
    used as the golden model for kernel tests, SURVEY.md §4)."""
    b = head_positions.shape[0]
    out = np.zeros((b, height, width), np.float32)
    yy, xx = np.mgrid[0:height, 0:width].astype(np.float32)
    for i in range(b):
        for j in range(int(head_counts[i])):
            hy, hx = head_positions[i, j]
            g = np.exp(-((yy - hy) ** 2 + (xx - hx) ** 2)
                       / (2.0 * sigma * sigma))
            total = g.sum()
            if total > 1e-12:
                out[i] += g / total
    return out
