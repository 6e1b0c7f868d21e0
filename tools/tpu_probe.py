#!/usr/bin/env python
"""Tunnel-health probe: run a trivial matmul on the ambient backend.

The axon remote-TPU tunnel intermittently degrades (a warm 8x8 matmul
taking 13-43 s) or stalls outright for 20+ minutes (CLAUDE.md
"Environment quirks"). Run this BEFORE interpreting any TPU timing or
diagnosing a "hang" in framework code:

    timeout 90 python tools/tpu_probe.py

Prints one line: backend, warm round-trip seconds, and init+compile
seconds. A timeout means the tunnel is down — wait minutes and retry;
it recovers on its own. Exit codes: 0 healthy, 2 up-but-DEGRADED
(warm op over 5 s), 1 wrong arithmetic.
"""
import time

import jax
import jax.numpy as jnp


def main() -> int:
    # Warm up first: the first call pays backend/tunnel init + XLA
    # compile (tens of seconds even on a healthy tunnel), which is not
    # what the degradation criterion measures — that's for a WARM op.
    t0 = time.time()
    warm = float(jax.device_get((jnp.ones((8, 8)) @ jnp.ones((8, 8)))[0, 0]))
    cold_dt = time.time() - t0
    t1 = time.time()
    value = float(jax.device_get(
        (jnp.full((8, 8), 2.0) @ jnp.ones((8, 8)))[0, 0]))
    dt = time.time() - t1
    status = "healthy" if dt < 5 else "DEGRADED"
    print(f"{jax.default_backend()} probe: warm {dt:.1f}s "
          f"(init+compile {cold_dt:.1f}s) ({status})")
    if warm != 8.0 or value != 16.0:
        return 1  # wrong arithmetic: something is badly broken
    return 0 if status == "healthy" else 2  # 2 = up but DEGRADED


if __name__ == "__main__":
    raise SystemExit(main())
