"""Benchmark: crowd SR-GAN training throughput on the local TPU chip.

Measures the steady-state fused-step rate of the flagship configuration —
JointCNN discriminator + DCGAN patch generator + DNN baseline, 224×224
patches, with the on-device Pallas input pipeline (random patch sampling
from an HBM-resident database) in the loop — i.e. the same end-to-end path
``CrowdExperiment.train()`` runs.

Prints ONE JSON line:
  {"metric": "crowd_srgan_images_per_sec_per_chip", "value": N,
   "unit": "images/sec/chip", "vs_baseline": N}

vs_baseline: the reference repo publishes no numbers (BASELINE.md;
``published: {}``). The denominator is a deliberately CONSERVATIVE 64
images/sec for the reference's eager PyTorch gan+dnn step at 224px on
its era GPU: the measurement-anchored estimate is ~20 img/s
(tools/torch_baseline.py measures the independently re-implemented
eager step at 0.237 img/s on this host's single Xeon core — a measured
eager utilization of ~25% of core fp32 peak — and transfers that
utilization to 1080Ti-class 11.3 TFLOP/s hardware; see BASELINE.md
"Measured reference denominator"), and 64 keeps a 3× safety margin
above it. vs_baseline is therefore a lower bound; the BASELINE.json
north star of "≥10×" corresponds to vs_baseline ≥ 10.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

REFERENCE_IMAGES_PER_SEC_ESTIMATE = 64.0

BATCH = 120  # v5e sweep: 591 @32, 652 @64, 757 @96, ~794 @112, ~798 @120, ~798 @124
PATCH = 224  # batch 128 exceeds the remote-compile window; 124 gains nothing
WARMUP_STEPS = 3
TIMED_STEPS = 20
# Default steps per dispatch (Settings.steps_per_dispatch). Measured on
# the v5e (BASELINE.md "dispatch chunking"): unrolled K=2 is flat vs K=1
# (801.6 vs 804.4 img/s) and a lax.scan chunk is 6.2× SLOWER — the ~6%
# device-vs-end-to-end gap is not dispatch-count-bound, so the default
# stays 1 (use --steps_per_dispatch to re-measure).
DISPATCH_STEPS = 1


def main(argv=None) -> None:
    import argparse

    parser = argparse.ArgumentParser()
    # Measures the HOST C++ input tier (native/srgan_io.cc threaded
    # prefetcher) instead of the default HBM-resident Pallas path — the
    # number that decides between tiers for larger-than-HBM databases.
    # The driver's contract (`python bench.py`, one JSON line) is the
    # default path, unchanged.
    parser.add_argument("--host_pipeline", action="store_true")
    # Steps per device dispatch (Settings.steps_per_dispatch): K>1 runs
    # K fused (sample + train) steps as ONE jitted straight-line
    # (unrolled) program, amortizing the per-step host cost (numpy draws
    # + dispatches over the remote tunnel; a lax.scan form measured 6×
    # slower — docs/design.md §7). HBM path only.
    parser.add_argument("--steps_per_dispatch", type=int, default=None)
    # Bounded tunnel-outage retry window: keep probing every
    # --probe_interval_secs for up to --probe_window_secs before giving
    # up (tunnel outages of 30+ min are the documented norm, CLAUDE.md;
    # failing fast ONCE forfeits the round's benchmark artifact —
    # VERDICT r3 weak #1). 0 restores single-probe fail-fast.
    parser.add_argument("--probe_window_secs", type=float, default=900.0)
    parser.add_argument("--probe_interval_secs", type=float, default=120.0)
    # HBM dtype of the label maps (Settings.crowd_label_dtype): measures
    # the capacity lever's (non-)cost — the sampler is not the
    # bottleneck, so bf16 should bench at parity with f32.
    parser.add_argument("--crowd_label_dtype", default="float32",
                        choices=["float32", "bfloat16"])
    args = parser.parse_args(argv)

    import jax

    # Fail fast with a diagnosis if the remote-TPU tunnel is in one of
    # its multi-hour outages (CLAUDE.md). The hang sits in native RPC
    # code that SIGALRM cannot interrupt, so the probe runs in a
    # SUBPROCESS under a hard deadline before this process touches the
    # backend at all.
    import subprocess
    import sys

    deadline = time.monotonic() + args.probe_window_secs
    attempt = 0
    while True:
        attempt += 1
        try:
            subprocess.run(
                [sys.executable, "-c",
                 "import jax, jax.numpy as jnp; "
                 "jax.device_get((jnp.ones((8,8)) @ jnp.ones((8,8)))[0,0])"],
                timeout=120, check=True, capture_output=True)
            break
        except subprocess.TimeoutExpired:
            remaining = deadline - time.monotonic()
            if remaining <= 0:
                raise SystemExit(
                    f"TPU tunnel unresponsive through {attempt} probes "
                    f"over {args.probe_window_secs:.0f} s (known "
                    f"intermittent outage — see CLAUDE.md); probe with "
                    f"tools/tpu_probe.py and rerun when it recovers")
            wait = min(args.probe_interval_secs, remaining)
            print(f"bench: TPU tunnel unresponsive (probe {attempt}); "
                  f"retrying in {wait:.0f} s "
                  f"({remaining:.0f} s left in window)", file=sys.stderr)
            time.sleep(wait)
        except subprocess.CalledProcessError as error:
            raise SystemExit(f"backend probe failed: "
                             f"{error.stderr.decode()[-500:]}")

    # Persist compiled executables: the remote-tunnel compile of the 224px
    # step costs ~4 min; repeated bench runs skip it entirely.
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/srgan_tpu_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from srgan_tpu.apps.crowd import CrowdExperiment
    from srgan_tpu.settings import Settings

    dispatch_steps = (args.steps_per_dispatch
                      if args.steps_per_dispatch is not None
                      else DISPATCH_STEPS)
    if args.host_pipeline:
        dispatch_steps = 1  # host tier streams one batch per step
    settings = Settings(
        trial_name="bench", logs_directory="/tmp/srgan_tpu_bench",
        batch_size=BATCH, image_patch_size=PATCH,
        model_base_width=64, latent_dimension=100,
        labeled_dataset_size=16, unlabeled_dataset_size=16,
        validation_dataset_size=2,
        crowd_image_height=384, crowd_image_width=512,
        steps_to_run=0, seed=0,
        compute_dtype="bfloat16",
        crowd_host_pipeline=args.host_pipeline,
        steps_per_dispatch=dispatch_steps,
        crowd_label_dtype=args.crowd_label_dtype,
    )
    exp = CrowdExperiment(settings)
    exp.dataset_setup()
    models, d_params, g_params, dnn_params = exp.model_setup()
    from srgan_tpu.train import init_train_state
    exp.models = models
    exp.state = init_train_state(settings, d_params, g_params, dnn_params)
    exp.prepare_mesh()
    exp.prepare_train_step()

    rng = np.random.default_rng(0)
    data = exp._device_data
    hw = exp.labeled_db.image_size

    if args.host_pipeline:
        epochs = exp.epoch_batch_iterators()

        def _chain():
            while True:  # epochs here are 1 step long (16-image split)
                yield from next(epochs)

        batches = _chain()

        def one_step(key):
            patches, density, upatches = next(batches)
            exp.state, metrics = exp._train_step(
                exp.state, patches, density, upatches, key)
            return metrics
    elif dispatch_steps > 1:
        # Chunked production path: K fused (sample + train) steps per
        # dispatch through the one scanned jit (apps/crowd.py
        # _prepare_train_chunk) — same data/key streams as per-step.
        arg_stream = exp._patch_args_stream()
        chain = {"key": None}

        def one_step(key):
            if chain["key"] is None:
                chain["key"] = key
            stacked = [np.stack(col) for col in zip(
                *(next(arg_stream) for _ in range(dispatch_steps)))]
            exp.state, chain["key"], metrics = exp._train_chunk(
                exp.state, chain["key"], data["labeled_images"],
                data["labeled_density"], data["unlabeled_images"],
                *stacked)
            return metrics
    else:
        def one_step(key):
            idx, offs, flips, sidx = exp._random_patch_args(
                rng, len(exp.labeled_db), hw, BATCH)
            uidx, uoffs, uflips, usidx = exp._random_patch_args(
                rng, len(exp.unlabeled_db), hw, BATCH)
            patches, density, upatches = exp._sample_batch(
                data["labeled_images"], data["labeled_density"],
                data["unlabeled_images"], idx, offs, flips, sidx,
                uidx, uoffs, uflips, usidx)
            exp.state, metrics = exp._train_step(
                exp.state, patches, density, upatches, key)
            return metrics

    import jax.random as jrandom

    def sync(metrics):
        # device_get is the reliable full sync (block_until_ready
        # returns early through the remote-TPU tunnel on this machine).
        return float(np.asarray(
            jax.device_get(metrics["d_total_loss"])).ravel()[-1])

    # Dispatch counts in units of one_step calls (each covers
    # dispatch_steps train steps); keep ≥ the per-step totals.
    warmup_dispatches = -(-WARMUP_STEPS // dispatch_steps)
    timed_dispatches = -(-TIMED_STEPS // dispatch_steps)
    timed_steps = timed_dispatches * dispatch_steps

    key = jrandom.key(0)
    for _ in range(warmup_dispatches):
        key, sub = jrandom.split(key)
        metrics = one_step(sub)
    sync(metrics)

    start = time.perf_counter()
    for _ in range(timed_dispatches):
        key, sub = jrandom.split(key)
        metrics = one_step(sub)
    sync(metrics)
    elapsed = time.perf_counter() - start

    images_per_sec = BATCH * timed_steps / elapsed
    metric = "crowd_srgan_images_per_sec_per_chip"
    if args.host_pipeline:
        metric += "_host_pipeline"
    print(json.dumps({
        "metric": metric,
        "value": round(images_per_sec, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(
            images_per_sec / REFERENCE_IMAGES_PER_SEC_ESTIMATE, 3),
    }))


if __name__ == "__main__":
    main()
