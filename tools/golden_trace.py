#!/usr/bin/env python
"""Record / compare golden loss traces of the fused SR-GAN step.

Fidelity infrastructure (SURVEY.md §4 "numerical parity"): a golden trace
is the per-step metric dict of a fixed-seed, fp32, CPU-deterministic
coefficient run. Uses:

* ``record`` — run N steps and write the trace to JSON. Committed traces
  pin today's numerics; the first session with a READABLE reference mount
  records the same trace from the actual PyTorch ``srgan.py`` and diffs
  it against ours (the SURVEY §0 verification protocol).
* ``compare`` — re-run and assert the current build reproduces a recorded
  trace within tolerance; catches any unintended numerics drift from
  refactors (fusions, kernel swaps, optimizer changes).

Usage:
    python tools/golden_trace.py record  --out traces/coefficient.json
    python tools/golden_trace.py compare --trace traces/coefficient.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax


def _force_cpu() -> None:
    # Golden traces are CPU/fp32 so they are hardware-independent and
    # bit-stable; must run before any backend initializes.
    jax.config.update("jax_platforms", "cpu")


def run_trace(steps: int, seed: int, hidden_size: int) -> list:
    """Per-step metrics of the fused GAN step on the coefficient config."""
    import jax.numpy as jnp

    from srgan_tpu.data.coefficient import coefficient_datasets
    from srgan_tpu.apps.coefficient import CoefficientExperiment
    from srgan_tpu.settings import Settings
    from srgan_tpu.train import init_train_state, make_gan_train_step
    from srgan_tpu.utils.seeding import KeySequence

    settings = Settings(batch_size=16, labeled_dataset_size=32,
                        unlabeled_dataset_size=64,
                        validation_dataset_size=8, test_dataset_size=8,
                        hidden_size=hidden_size, seed=seed,
                        compute_dtype="float32")
    experiment = CoefficientExperiment(settings)
    experiment.dataset_setup()
    models, d_params, g_params, dnn_params = experiment.model_setup()
    state = init_train_state(settings, d_params, g_params, dnn_params)
    step_fn = jax.jit(make_gan_train_step(settings, models))

    labeled, unlabeled = experiment.labeled_dataset, \
        experiment.unlabeled_dataset
    keys = KeySequence(settings.seed, "train")
    rng = np.random.default_rng(settings.seed)
    trace = []
    for i in range(steps):
        idx = rng.integers(0, len(labeled), settings.batch_size)
        uidx = rng.integers(0, len(unlabeled), settings.batch_size)
        state, metrics = step_fn(
            state, jnp.asarray(labeled.examples[idx]),
            jnp.asarray(labeled.labels[idx]),
            jnp.asarray(unlabeled.examples[uidx]), keys.next())
        trace.append({k: float(v)
                      for k, v in jax.device_get(metrics).items()})
    return trace


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    parser.add_argument("mode", choices=["record", "compare"])
    parser.add_argument("--steps", type=int, default=20)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--hidden-size", type=int, default=10)
    parser.add_argument("--out", type=str, default=None)
    parser.add_argument("--trace", type=str, default=None)
    parser.add_argument("--rtol", type=float, default=1e-5)
    parser.add_argument("--atol", type=float, default=1e-6)
    args = parser.parse_args(argv)

    _force_cpu()
    trace = run_trace(args.steps, args.seed, args.hidden_size)
    if args.mode == "record":
        out = args.out or "golden_trace.json"
        with open(out, "w") as f:
            json.dump({"steps": args.steps, "seed": args.seed,
                       "hidden_size": args.hidden_size,
                       "trace": trace}, f, indent=1)
        print(f"recorded {args.steps} steps to {out}")
        return 0

    if not args.trace:
        parser.error("compare requires --trace")
    with open(args.trace) as f:
        golden = json.load(f)
    if (golden["steps"], golden["seed"], golden["hidden_size"]) != \
            (args.steps, args.seed, args.hidden_size):
        print(f"config mismatch: trace was recorded with "
              f"steps={golden['steps']} seed={golden['seed']} "
              f"hidden_size={golden['hidden_size']}")
        return 2
    worst = 0.0
    for i, (got, want) in enumerate(zip(trace, golden["trace"])):
        for key, want_v in want.items():
            got_v = got[key]
            err = abs(got_v - want_v) / max(abs(want_v), args.atol)
            worst = max(worst, err)
            if abs(got_v - want_v) > args.atol + args.rtol * abs(want_v):
                print(f"MISMATCH step {i} {key}: {got_v!r} vs "
                      f"golden {want_v!r}")
                return 1
    print(f"trace matches ({args.steps} steps, worst rel err {worst:.2e})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
