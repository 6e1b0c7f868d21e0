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


def run_trace(steps: int, seed: int, hidden_size: int,
              app: str = "coefficient") -> list:
    """Per-step metrics of the fused GAN step on a fixed tiny config.

    ``app="coefficient"`` exercises the MLP path; ``app="crowd"``
    exercises the conv/GroupNorm/two-head path (tiny synthetic crowd, the
    same models the flagship runs).
    """
    import jax.numpy as jnp

    from srgan_tpu.settings import Settings
    from srgan_tpu.train import init_train_state, make_gan_train_step
    from srgan_tpu.utils.seeding import KeySequence

    if app == "coefficient":
        from srgan_tpu.apps.coefficient import CoefficientExperiment

        settings = Settings(batch_size=16, labeled_dataset_size=32,
                            unlabeled_dataset_size=64,
                            validation_dataset_size=8, test_dataset_size=8,
                            hidden_size=hidden_size, seed=seed,
                            compute_dtype="float32")
        experiment = CoefficientExperiment(settings)
    elif app == "age":
        # DCGAN path: ConvTranspose generator + conv regressor — pins the
        # transposed-conv numerics the other traces don't touch
        # (VERDICT r2 next #7).
        from srgan_tpu.apps.age import AgeExperiment

        settings = Settings(batch_size=4, labeled_dataset_size=8,
                            unlabeled_dataset_size=8,
                            validation_dataset_size=2,
                            test_dataset_size=2,
                            age_image_size=32, model_base_width=8,
                            latent_dimension=8, seed=seed,
                            compute_dtype="float32")
        experiment = AgeExperiment(settings)
    elif app == "driving":
        # Channel-stacked frame path: same conv families as age but with
        # 3*frame_stack input channels — pins the frame-stacking data
        # convention and the stacked-channel G/D numerics.
        from srgan_tpu.apps.driving import DrivingExperiment

        settings = Settings(batch_size=4, labeled_dataset_size=8,
                            unlabeled_dataset_size=8,
                            validation_dataset_size=2,
                            test_dataset_size=2,
                            age_image_size=32, driving_frame_stack=2,
                            model_base_width=8, latent_dimension=8,
                            seed=seed, compute_dtype="float32")
        experiment = DrivingExperiment(settings)
    elif app == "crowd":
        from srgan_tpu.apps.crowd import CrowdExperiment

        settings = Settings(batch_size=4, labeled_dataset_size=4,
                            unlabeled_dataset_size=4,
                            validation_dataset_size=2,
                            crowd_image_height=64, crowd_image_width=64,
                            image_patch_size=32, crowd_sigma=3.0,
                            model_base_width=8, latent_dimension=8,
                            seed=seed, compute_dtype="float32")
        experiment = CrowdExperiment(settings)
        experiment.dataset_setup()
        models, d_params, g_params, dnn_params = experiment.model_setup()
        state = init_train_state(settings, d_params, g_params, dnn_params)
        step_fn = jax.jit(make_gan_train_step(
            settings, models,
            labeled_loss_fn=experiment.labeled_loss_fn()))
        p = settings.image_patch_size
        images = experiment.labeled_db.images.astype(np.float32)
        density = experiment.labeled_db.density_maps
        uimages = experiment.unlabeled_db.images.astype(np.float32)
        rng = np.random.default_rng(settings.seed)

        def next_batch():
            idx = rng.integers(0, len(images), settings.batch_size)
            # fixed top-left patches: host-side, hardware-independent
            patches = images[idx, :p, :p] * (2.0 / 255.0) - 1.0
            labels = density[idx, :p, :p]
            uidx = rng.integers(0, len(uimages), settings.batch_size)
            upatches = uimages[uidx, :p, :p] * (2.0 / 255.0) - 1.0
            return (jnp.asarray(patches), jnp.asarray(labels),
                    jnp.asarray(upatches))
    else:
        raise ValueError(f"unknown app {app!r}; choose coefficient|age|crowd|driving")

    if app in ("coefficient", "age", "driving"):
        # Shared ArrayDataset batch draw (index sampling WITH replacement,
        # host RNG) — one definition so the two traces can never diverge
        # in batch-draw convention.
        experiment.dataset_setup()
        models, d_params, g_params, dnn_params = experiment.model_setup()
        state = init_train_state(settings, d_params, g_params, dnn_params)
        step_fn = jax.jit(make_gan_train_step(
            settings, models,
            labeled_loss_fn=experiment.labeled_loss_fn()))
        labeled, unlabeled = experiment.labeled_dataset, \
            experiment.unlabeled_dataset
        rng = np.random.default_rng(settings.seed)

        def next_batch():
            idx = rng.integers(0, len(labeled), settings.batch_size)
            uidx = rng.integers(0, len(unlabeled), settings.batch_size)
            return (jnp.asarray(labeled.examples[idx]),
                    jnp.asarray(labeled.labels[idx]),
                    jnp.asarray(unlabeled.examples[uidx]))

    keys = KeySequence(settings.seed, "train")
    trace = []
    for _ in range(steps):
        labeled_x, labels, unlabeled_x = next_batch()
        state, metrics = step_fn(state, labeled_x, labels, unlabeled_x,
                                 keys.next())
        trace.append({k: float(v)
                      for k, v in jax.device_get(metrics).items()})
    return trace


def compare_traces(trace: list, golden_trace: list, rtol: float,
                   atol: float) -> Optional[str]:
    """None if every step/metric matches within tolerance, else a
    description of the first mismatch. Single source of 'reproduces' —
    the CLI and tests/test_golden_trace.py both use it."""
    if len(trace) != len(golden_trace):
        return (f"length mismatch: {len(trace)} steps vs golden "
                f"{len(golden_trace)}")
    for i, (got, want) in enumerate(zip(trace, golden_trace)):
        for key, want_v in want.items():
            got_v = got[key]
            if not (abs(got_v - want_v) <= atol + rtol * abs(want_v)):
                return (f"step {i} {key}: {got_v!r} vs golden {want_v!r}")
    return None


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    parser.add_argument("mode", choices=["record", "compare"])
    parser.add_argument("--app", choices=["coefficient", "age", "crowd", "driving"],
                        default="coefficient")
    parser.add_argument("--steps", type=int, default=20)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--hidden-size", type=int, default=10)
    parser.add_argument("--out", type=str, default=None)
    parser.add_argument("--trace", type=str, default=None)
    parser.add_argument("--rtol", type=float, default=1e-5)
    parser.add_argument("--atol", type=float, default=1e-6)
    args = parser.parse_args(argv)

    _force_cpu()
    if args.mode == "record":
        trace = run_trace(args.steps, args.seed, args.hidden_size,
                          args.app)
        out = args.out or "golden_trace.json"
        with open(out, "w") as f:
            json.dump({"app": args.app, "steps": args.steps,
                       "seed": args.seed,
                       "hidden_size": args.hidden_size,
                       "trace": trace}, f, indent=1)
        print(f"recorded {args.steps} steps to {out}")
        return 0

    if not args.trace:
        parser.error("compare requires --trace")
    # Config comes from the recorded file — loaded BEFORE the (possibly
    # minutes-long) run, so a mismatch can't waste a full re-run and the
    # caller never has to re-supply app/steps/seed.
    with open(args.trace) as f:
        golden = json.load(f)
    trace = run_trace(golden["steps"], golden["seed"],
                      golden["hidden_size"],
                      golden.get("app", "coefficient"))
    mismatch = compare_traces(trace, golden["trace"], args.rtol, args.atol)
    if mismatch:
        print(f"MISMATCH {mismatch}")
        return 1
    print(f"trace matches ({golden['steps']} steps)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
