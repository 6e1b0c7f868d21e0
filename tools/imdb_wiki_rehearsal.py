#!/usr/bin/env python
"""IMDB-WIKI-scale age preprocessing rehearsal (VERDICT r4 #5).

The real IMDB-WIKI dataset does not exist on this machine, but its
offline path — a ~460k-record .mat metadata file (NaN DOBs, -inf face
scores, multi-face rows, missing files) feeding the per-image
crop/resize loop and the .npz pack — must be rehearsed AT SCALE before
the first real-data run, exactly like the crowd rehearsal
(tools/ucf_qnrf_rehearsal.py), which immediately found a days-long kNN
wall at scale.

This script:
  1. Synthesizes a wiki.mat with --records rows (default 460,000 — the
     IMDB-WIKI imdb split's documented order of magnitude), with
     realistic dirt injected: NaN/inf DOBs, -inf and sub-threshold face
     scores, finite second-face scores, out-of-range ages, and records
     pointing at files that do not exist on disk.
  2. Writes --images real JPEGs (the records cycle over them — decode
     cost per image is measured; page-cache reuse only helps the read).
  3. Runs the production entries end to end and times each stage:
     parse_imdb_wiki_metadata at FULL metadata scale, then
     preprocess_imdb_wiki over --limit images, then the npz save.
  4. Extrapolates the per-image stages to the full filtered count and
     prints one JSON report for BASELINE.md.

Usage:
    python tools/imdb_wiki_rehearsal.py [--records N] [--images M]
        [--limit K] [--image-size 64] [--keep]
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


def _peak_rss_gb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


def synthesize_raw(root: str, records: int, images: int, seed: int
                   ) -> str:
    """IMDB-WIKI-layout raw tree: wiki.mat (+ dirt) and JPEG files."""
    from PIL import Image
    from scipy.io import savemat

    rng = np.random.default_rng(seed)
    os.makedirs(os.path.join(root, "00"), exist_ok=True)
    # Real JPEGs at the dataset's typical face-crop scale (~150-600 px);
    # records cycle over them.
    sizes = rng.integers(120, 600, images)
    for i in range(images):
        arr = rng.integers(0, 255, (sizes[i], sizes[i], 3), np.uint8)
        Image.fromarray(arr).save(os.path.join(root, f"00/img_{i}.jpg"),
                                  quality=85)
    # Metadata: mostly-clean rows with injected dirt classes.
    dob = rng.uniform(675000, 735000, records)  # ~1848..2012 datenums
    photo_taken = rng.integers(1990, 2015, records).astype(np.float64)
    face_score = rng.uniform(0.5, 6.0, records)
    second_face = np.full(records, np.nan)
    dirt = rng.random(records)
    dob[dirt < 0.02] = np.nan                      # unknown DOB
    dob[(dirt >= 0.02) & (dirt < 0.03)] = np.inf   # corrupt DOB
    face_score[(dirt >= 0.03) & (dirt < 0.18)] = -np.inf  # no face found
    second_mask = (dirt >= 0.18) & (dirt < 0.28)   # second face present
    second_face[second_mask] = rng.uniform(0.5, 5.0,
                                           int(second_mask.sum()))
    photo_taken[(dirt >= 0.28) & (dirt < 0.30)] = 1800.0  # negative age
    missing = (dirt >= 0.30) & (dirt < 0.32)       # file absent on disk
    full_path = np.empty((1, records), object)
    for i in range(records):
        name = (f"00/missing_{i}.jpg" if missing[i]
                else f"00/img_{i % images}.jpg")
        full_path[0, i] = np.array([name])
    wiki = np.zeros((1, 1), dtype=[
        ("dob", object), ("photo_taken", object), ("full_path", object),
        ("face_score", object), ("second_face_score", object)])
    wiki[0, 0] = (dob.reshape(1, -1), photo_taken.reshape(1, -1),
                  full_path, face_score.reshape(1, -1),
                  second_face.reshape(1, -1))
    mat_path = os.path.join(root, "wiki.mat")
    savemat(mat_path, {"wiki": wiki})
    return mat_path


def main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--records", type=int, default=460_000)
    parser.add_argument("--images", type=int, default=2000)
    parser.add_argument("--limit", type=int, default=5000,
                        help="filtered records actually decoded/packed; "
                             "per-image stages extrapolate to the full "
                             "filtered count")
    parser.add_argument("--image-size", type=int, default=64)
    parser.add_argument("--out-dir", default=None)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--keep", action="store_true")
    args = parser.parse_args(argv)

    from srgan_tpu.data.age import (parse_imdb_wiki_metadata,
                                    preprocess_imdb_wiki)

    root = args.out_dir or tempfile.mkdtemp(prefix="imdb_rehearsal_")
    report = {"records": args.records, "jpeg_files": args.images,
              "decoded_limit": args.limit, "image_size": args.image_size}
    try:
        t0 = time.perf_counter()
        mat_path = synthesize_raw(root, args.records, args.images,
                                  args.seed)
        report["synthesize_secs"] = round(time.perf_counter() - t0, 1)
        report["mat_mb"] = round(os.path.getsize(mat_path) / 1e6, 1)

        t0 = time.perf_counter()
        paths, ages = parse_imdb_wiki_metadata(mat_path)
        report["parse_secs"] = round(time.perf_counter() - t0, 2)
        report["filtered_records"] = int(len(paths))
        assert np.isfinite(ages).all()
        assert (ages >= 0).all() and (ages <= 100).all()

        out = os.path.join(root, "age.npz")
        t0 = time.perf_counter()
        images, out_ages = preprocess_imdb_wiki(
            root, mat_path, image_size=args.image_size,
            limit=args.limit, output_path=out)
        decode_secs = time.perf_counter() - t0
        report["preprocess_secs"] = round(decode_secs, 1)
        report["packed_examples"] = int(len(images))
        report["npz_mb"] = round(os.path.getsize(out) / 1e6, 1)
        report["peak_rss_gb"] = round(_peak_rss_gb(), 2)
        # Extrapolate the per-image stage to the full filtered count.
        scale = len(paths) / max(1, args.limit)
        report["extrapolated_full_preprocess_hours"] = round(
            decode_secs * scale / 3600, 2)
        report["extrapolated_full_npz_gb"] = round(
            os.path.getsize(out) / 1e9 * scale, 2)
        # Full-scale RAM estimate for the in-RAM pack (images array is
        # allocated for ALL filtered records before the valid mask).
        report["full_pack_ram_gb"] = round(
            len(paths) * args.image_size ** 2 * 3 / 1e9, 2)
        print(json.dumps(report, indent=2))
        return 0
    finally:
        if not args.keep:
            shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
