"""Measure the HBM bandwidth ceiling of Pallas grid layouts for GroupNorm.

Round-2 finding (docs/design.md §7): a pure copy kernel over PER-EXAMPLE
[HW, C] blocks reaches only ~261 GB/s at the flagship GroupNorm shape,
while XLA's two-pass GN streams faster — so the fused Pallas GN lost.
Open question (VERDICT r2 next #6): is that ceiling the per-example GRID
LAYOUT (one block per example, pipeline too shallow) or the memory
system? This tool times three variants of the same [120·12544, 128]
bf16 copy on the real chip:

  per_example   — grid=(B,), block [1, HW', 128]  (round-2 layout)
  batch_strided — grid over flat row chunks, block [rows, 128], several
                  chunk sizes (examples share blocks; alignment-free)
  xla           — jnp copy of the same array (XLA's streaming ceiling)

Prints one JSON line per variant. Timing via float(device_get(scalar))
(block_until_ready returns early through the remote-TPU tunnel).
"""

from __future__ import annotations

import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


# Flagship GroupNorm shape: B=120 examples of 112x112 px, C=64, bf16,
# lane-folded 2 px -> [B, 6272, 128] (ops/fused_norm.py _fold_factor).
B, HW, C = 120, 6272, 128
DTYPE = jnp.bfloat16


def _copy_kernel(x_ref, o_ref):
    o_ref[...] = x_ref[...]


@functools.partial(jax.jit, static_argnames=("variant", "rows"))
def copy(x, variant: str, rows: int = 0):
    if variant == "xla":
        return x + jnp.zeros((), DTYPE)  # forces a materialized copy
    if variant == "per_example":
        x3 = x.reshape(B, HW, C)
        out = pl.pallas_call(
            _copy_kernel,
            grid=(B,),
            in_specs=[pl.BlockSpec((1, HW, C), lambda i: (i, 0, 0))],
            out_specs=pl.BlockSpec((1, HW, C), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((B, HW, C), DTYPE),
        )(x3)
        return out.reshape(B * HW, C)
    if variant == "batch_strided":
        n = x.shape[0]
        assert n % rows == 0, (n, rows)
        return pl.pallas_call(
            _copy_kernel,
            grid=(n // rows,),
            in_specs=[pl.BlockSpec((rows, C), lambda i: (i, 0))],
            out_specs=pl.BlockSpec((rows, C), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((n, C), DTYPE),
        )(x)
    raise ValueError(variant)


def _sync(y):
    float(jax.device_get(y.ravel()[0]))


def time_variant(x, variant, rows=0, reps=30):
    y = copy(x, variant, rows)
    _sync(y)  # compile + warm
    start = time.perf_counter()
    for _ in range(reps):
        y = copy(x, variant, rows)
    _sync(y)
    sec = (time.perf_counter() - start) / reps
    gb = 2 * x.size * x.dtype.itemsize / 1e9  # read + write
    return {"variant": variant, "rows_per_block": rows,
            "ms": round(sec * 1e3, 3), "GBps": round(gb / sec, 1)}


def main():
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/srgan_tpu_bench_cache")
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((B * HW, C)), DTYPE)
    results = [time_variant(x, "xla"), time_variant(x, "per_example")]
    # Chunk sizes divide B*HW = 2^10*3*5*7^2; VMEM per block stays under
    # ~13 MB (in+out, double-buffered) at the largest.
    for rows in (512, 1024, 3136, 6272, 12544):
        if (B * HW) % rows == 0:
            results.append(time_variant(x, "batch_strided", rows))
    for r in results:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
