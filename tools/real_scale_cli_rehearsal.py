#!/usr/bin/env python
"""Real-scale end-to-end training rehearsal through the PUBLIC CLI
(VERDICT r4 #3).

No real crowd dataset exists on this machine, so the exact chain a
UCF-QNRF user runs — raw native-resolution images + .mat annotations →
preprocessing CLI (``python -m srgan_tpu.data.crowd --mode tiles``) →
multi-GB npz database → training CLI (``python -m srgan_tpu crowd
--crowd_database_path ...``) with tier selection → grid evaluation —
had never run at realistic array sizes. This tool runs it end to end:

  1. Generates --images native-resolution (default 3000×4000) raw
     images with windowed blob rendering (the slow full-image renderer
     in scale_fidelity_ab.py is a per-image minute at this size).
  2. Preprocesses each split through the public module CLI in tiles
     mode, timed (the multi-GB npz writes included).
  3. Trains through ``python -m srgan_tpu crowd`` on the real chip for
     --steps steps with the HBM window tier
     (``--crowd_hbm_window``), then grid-evaluates — parsing the CLI's
     JSON result and the trial's throughput scalars.
  4. Prints one JSON report for BASELINE.md (DB size, preprocess time,
     load+upload time, steady img/s, MAE).

Usage:
    python tools/real_scale_cli_rehearsal.py [--images 100]
        [--steps 400] [--keep] [--skip-train]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def generate_raw_fast(root: str, split: str, count: int, height: int,
                      width: int, blob_sigma: float, max_heads: int,
                      seed: int) -> None:
    """Native-resolution raw crowd images in the UCF-QNRF layout, with
    WINDOWED blob rendering (each head touches only a ±3σ patch — the
    full-image-exp generator costs ~a minute per 3000×4000 image)."""
    from PIL import Image
    from scipy.io import savemat

    rng = np.random.default_rng(seed)
    raw = os.path.join(root, split)
    os.makedirs(raw, exist_ok=True)
    r = int(3 * blob_sigma)
    yy, xx = np.mgrid[-r:r + 1, -r:r + 1].astype(np.float32)
    kernel = np.exp(-(yy ** 2 + xx ** 2) / (2.0 * blob_sigma ** 2))
    for i in range(count):
        n = int(rng.integers(8, max_heads + 1))
        heads_yx = np.stack([rng.uniform(0, height, n),
                             rng.uniform(0, width, n)], axis=-1)
        canvas = np.zeros((height, width), np.float32)
        for hy, hx in heads_yx:
            cy, cx = int(round(hy)), int(round(hx))
            y0, y1 = max(0, cy - r), min(height, cy + r + 1)
            x0, x1 = max(0, cx - r), min(width, cx + r + 1)
            canvas[y0:y1, x0:x1] += kernel[y0 - cy + r:y1 - cy + r,
                                           x0 - cx + r:x1 - cx + r]
        pixels = (40.0 + 140.0 * np.clip(canvas, 0, 1.2))
        noise = rng.integers(0, 16, (height, width, 1), dtype=np.uint8)
        u8 = np.clip(pixels[..., None] + noise, 0, 255).astype(np.uint8)
        u8 = np.repeat(u8, 3, axis=-1)
        Image.fromarray(u8).save(os.path.join(raw, f"img_{i:04d}.jpg"),
                                 quality=90)
        savemat(os.path.join(raw, f"img_{i:04d}_ann.mat"),
                {"annPoints": heads_yx[:, ::-1]})  # (x, y) convention


def main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--images", type=int, default=100,
                        help="labeled source images (unlabeled gets half,"
                             " validation 6)")
    parser.add_argument("--size", type=int, nargs=2, default=[3000, 4000])
    parser.add_argument("--steps", type=int, default=400)
    parser.add_argument("--window", type=int, default=1024)
    parser.add_argument("--batch", type=int, default=120)
    parser.add_argument("--clip", type=float, default=0.0,
                        help="Settings.gradient_clip_norm (1.0 stabilizes "
                             "the documented no-clip count-head "
                             "divergence; 0 = off)")
    parser.add_argument("--ul", type=float, default=1.0,
                        help="unlabeled_loss_multiplier")
    parser.add_argument("--work-dir", default="/tmp/srgan_cli_rehearsal")
    parser.add_argument("--keep", action="store_true")
    parser.add_argument("--skip-gen", action="store_true",
                        help="reuse an existing raw/db tree")
    parser.add_argument("--skip-train", action="store_true")
    args = parser.parse_args(argv)

    h, w = args.size
    raw_root = os.path.join(args.work_dir, "raw")
    db_root = os.path.join(args.work_dir, "db")
    report = {"source_images": args.images, "source_size": [h, w]}
    try:
        if not args.skip_gen or not os.path.exists(
                os.path.join(db_root, "validation.npz")):
            t0 = time.perf_counter()
            for split, n, s in (("labeled", args.images, 1),
                                ("unlabeled", args.images // 2, 2),
                                ("validation", 6, 3)):
                generate_raw_fast(raw_root, split, n, h, w,
                                  blob_sigma=24.0, max_heads=48, seed=s)
            report["generate_secs"] = round(time.perf_counter() - t0, 1)

            # Stage 2: the PUBLIC preprocessing CLI, per split.
            os.makedirs(db_root, exist_ok=True)
            t0 = time.perf_counter()
            for split in ("labeled", "unlabeled", "validation"):
                proc = subprocess.run(
                    [sys.executable, "-m", "srgan_tpu.data.crowd",
                     os.path.join(raw_root, split),
                     os.path.join(db_root, f"{split}.npz"),
                     "--mode", "tiles"],
                    cwd=REPO, capture_output=True, text=True)
                if proc.returncode != 0:
                    raise SystemExit(f"preprocess CLI failed for {split}:"
                                     f"\n{proc.stdout}\n{proc.stderr}")
                print(proc.stdout.strip(), file=sys.stderr, flush=True)
            report["preprocess_secs"] = round(time.perf_counter() - t0, 1)
        report["db_gb"] = round(sum(
            os.path.getsize(os.path.join(db_root, f))
            for f in os.listdir(db_root) if f.endswith(".npz")) / 1e9, 2)

        if args.skip_train:
            print(json.dumps(report, indent=2))
            return 0

        # Stage 3: the PUBLIC training CLI on the real chip, window tier.
        logs = os.path.join(args.work_dir, "logs")
        t0 = time.perf_counter()
        proc = subprocess.run(
            [sys.executable, "-m", "srgan_tpu", "crowd",
             "--crowd_database_path", db_root,
             "--crowd_hbm_window", str(args.window),
             "--batch_size", str(args.batch),
             "--image_patch_size", "224",
             "--model_base_width", "64",
             "--latent_dimension", "100",
             "--compute_dtype", "bfloat16",
             "--steps_to_run", str(args.steps),
             "--summary_step_period", "50",
             "--validation_step_period", str(args.steps),
             "--gradient_clip_norm", str(args.clip),
             "--unlabeled_loss_multiplier", str(args.ul),
             "--trial_name", "cli_rehearsal",
             "--logs_directory", logs,
             "--compilation_cache_dir", "/tmp/srgan_tpu_bench_cache"],
            cwd=REPO, capture_output=True, text=True)
        report["train_wall_secs"] = round(time.perf_counter() - t0, 1)
        # The CLI's one-line JSON result is the last stdout line.
        if proc.returncode != 0:
            raise SystemExit(f"training CLI failed:\n"
                             f"{proc.stdout[-2000:]}\n"
                             f"{proc.stderr[-4000:]}")
        cli_result = json.loads(proc.stdout.strip().splitlines()[-1])
        report["validation"] = cli_result["validation"]
        for line in proc.stderr.splitlines():
            if "UserWarning" in line and "HBM" in line:
                report["budget_warning"] = line.strip()

        # Steady-state throughput from the trial's scalars.
        trial = cli_result["trial_directory"]
        scalars = os.path.join(trial, "GAN", "scalars.jsonl")
        rates = []
        if os.path.exists(scalars):  # 0-step runs write no scalars
            with open(scalars) as f:
                for line in f:
                    row = json.loads(line)
                    if row.get("tag") == "throughput/examples_per_second":
                        rates.append(row["value"])
        if rates:
            report["steady_images_per_sec"] = round(
                float(np.median(rates[1:] or rates)), 1)
            report["throughput_samples"] = [round(r, 1) for r in rates]
        print(json.dumps(report, indent=2))
        # Clean up only on SUCCESS: the raw/db artifacts take ~an hour to
        # regenerate and are exactly what --skip-gen reuses and what a
        # failure post-mortem needs — never delete them on error paths.
        if not args.keep:
            shutil.rmtree(args.work_dir, ignore_errors=True)
        return 0
    except BaseException:
        print(f"leaving work tree for inspection/--skip-gen reuse: "
              f"{args.work_dir}", file=sys.stderr)
        raise


if __name__ == "__main__":
    raise SystemExit(main())
