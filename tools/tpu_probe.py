#!/usr/bin/env python
"""Tunnel-health probe: run a trivial matmul on the ambient backend.

The axon remote-TPU tunnel intermittently degrades (a warm 8x8 matmul
taking 13-43 s) or stalls outright for 20+ minutes (CLAUDE.md
"Environment quirks"). Run this BEFORE interpreting any TPU timing or
diagnosing a "hang" in framework code:

    timeout 90 python tools/tpu_probe.py

Prints one line: backend, result, and round-trip seconds. A timeout
means the tunnel is down — wait minutes and retry; it recovers on its
own. Exit code 0 on success.
"""
import time

import jax
import jax.numpy as jnp


def main() -> int:
    t0 = time.time()
    x = jnp.ones((8, 8)) @ jnp.ones((8, 8))
    value = float(jax.device_get(x[0, 0]))  # real sync; see CLAUDE.md
    dt = time.time() - t0
    status = "healthy" if dt < 5 else "DEGRADED"
    print(f"{jax.default_backend()} probe: {value} in {dt:.1f}s "
          f"({status})")
    return 0 if value == 8.0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
