"""Benchmark the HBM window tier on a larger-than-HBM synthetic database.

Builds (once, cached on disk) a memmap-backed crowd database of
``--total-gb`` (default 32 GB ≈ 2× the v5e's 16 GB HBM — the scale of a
real UCF-QNRF ``--mode tiles`` database, BASELINE.md) and measures the
flagship fused-step rate (bench.py config: 224px patches, batch 120,
bf16) with only a ``--window``-example rotating window of each training
split resident in HBM (``Settings.crowd_hbm_window``, data/window.py).

This is the tier-decision measurement for databases that exceed HBM:
 - HBM-resident (whole DB): 806 img/s but impossible at this scale.
 - Host C++ streaming tier: 73.8 img/s (input-bound, BASELINE.md r4).
 - Window tier (this bench): target ≈ the HBM-resident rate, with the
   dataset rotating through HBM at host→device IO speed (this machine's
   remote-TPU tunnel: ~25 MB/s; a real TPU host PCIe: GB/s).

Prints one JSON line with images/sec, refreshes applied during the
timed region, effective refresh bandwidth, and the extrapolated
full-rotation time at that bandwidth.

Usage:
  python tools/window_bench.py [--total-gb 32] [--window 1024]
                               [--slices 8] [--steps 200] [--smoke]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

H, W = 384, 512  # flagship bench image size (bench.py)
BYTES_PER_LABELED = H * W * 3 + H * W * 4  # u8 image + f32 density
BYTES_PER_UNLABELED = H * W * 3


def build_database(root: str, total_gb: float) -> dict:
    """Create (or reuse) the memmap-backed synthetic splits on disk."""
    os.makedirs(root, exist_ok=True)
    # Split the byte budget evenly between labeled (image+density) and
    # unlabeled (image only) splits.
    half = total_gb * 1e9 / 2
    n_lab = int(half // BYTES_PER_LABELED)
    n_unl = int(half // BYTES_PER_UNLABELED)
    meta_path = os.path.join(root, "meta.json")
    paths = {k: os.path.join(root, f"{k}.npy")
             for k in ("labeled_images", "labeled_density",
                       "unlabeled_images")}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
        if meta["n_lab"] == n_lab and meta["n_unl"] == n_unl:
            return {"n_lab": n_lab, "n_unl": n_unl, "paths": paths}
    print(f"window_bench: building {total_gb:.0f} GB synthetic database "
          f"({n_lab} labeled + {n_unl} unlabeled {H}x{W} images) under "
          f"{root} ...", file=sys.stderr, flush=True)
    rng = np.random.default_rng(0)
    t0 = time.perf_counter()
    arr = np.lib.format.open_memmap(
        paths["labeled_images"], mode="w+", dtype=np.uint8,
        shape=(n_lab, H, W, 3))
    chunk = 512
    for s in range(0, n_lab, chunk):
        e = min(s + chunk, n_lab)
        arr[s:e] = rng.integers(0, 256, (e - s, H, W, 3), dtype=np.uint8)
    arr.flush()
    del arr
    arr = np.lib.format.open_memmap(
        paths["labeled_density"], mode="w+", dtype=np.float32,
        shape=(n_lab, H, W))
    # Constant per-image density (mass = "head count"): throughput does
    # not depend on label content, and constants make counts exact.
    per_px = 20.0 / (H * W)
    for s in range(0, n_lab, chunk):
        e = min(s + chunk, n_lab)
        arr[s:e] = per_px
    arr.flush()
    del arr
    arr = np.lib.format.open_memmap(
        paths["unlabeled_images"], mode="w+", dtype=np.uint8,
        shape=(n_unl, H, W, 3))
    for s in range(0, n_unl, chunk):
        e = min(s + chunk, n_unl)
        arr[s:e] = rng.integers(0, 256, (e - s, H, W, 3), dtype=np.uint8)
    arr.flush()
    del arr
    with open(meta_path, "w") as f:
        json.dump({"n_lab": n_lab, "n_unl": n_unl}, f)
    print(f"window_bench: database built in "
          f"{time.perf_counter() - t0:.0f} s", file=sys.stderr, flush=True)
    return {"n_lab": n_lab, "n_unl": n_unl, "paths": paths}


def main(argv=None) -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--total-gb", type=float, default=32.0)
    parser.add_argument("--window", type=int, default=1024)
    parser.add_argument("--slices", type=int, default=8)
    parser.add_argument("--steps", type=int, default=200)
    parser.add_argument("--warmup", type=int, default=5)
    parser.add_argument("--batch", type=int, default=120)
    parser.add_argument("--patch", type=int, default=224)
    parser.add_argument("--refresh-period", type=int, default=0,
                        help="0 = opportunistic (default)")
    parser.add_argument("--base-width", type=int, default=64)
    parser.add_argument("--label-dtype", default="float32",
                        choices=["float32", "bfloat16"],
                        help="HBM dtype of the window's label maps "
                             "(Settings.crowd_label_dtype): bfloat16 "
                             "halves the labeled window and its refresh "
                             "slices")
    parser.add_argument("--db-root", default="/tmp/srgan_window_bench_db")
    parser.add_argument("--smoke", action="store_true",
                        help="1 GB DB, tiny window/steps/model")
    args = parser.parse_args(argv)
    if args.smoke:
        args.total_gb = min(args.total_gb, 1.0)
        args.window, args.slices = 64, 4
        args.steps, args.warmup = 8, 2
        args.batch, args.patch = 16, 64
        args.base_width = 16

    db = build_database(args.db_root, args.total_gb)

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/srgan_tpu_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from srgan_tpu.apps.crowd import CrowdExperiment
    from srgan_tpu.data.crowd import CrowdDatabase, synthetic_crowd_database
    from srgan_tpu.settings import Settings
    from srgan_tpu.train import init_train_state

    def load_split(images_path, density_path=None, n=None):
        images = np.load(images_path, mmap_mode="r")
        if density_path is not None:
            density = np.load(density_path, mmap_mode="r")
            counts = np.full(len(images), 20.0, np.float32)
        else:
            # The sampler never reads unlabeled density; a broadcast
            # zero view keeps the container honest without disk cost.
            density = np.broadcast_to(
                np.zeros((1, H, W), np.float32), images.shape[:3])
            counts = np.zeros(len(images), np.float32)
        return CrowdDatabase(
            images=images, density_maps=density, head_counts=counts,
            image_mean=np.full(3, 0.5, np.float32),
            image_std=np.full(3, 0.3, np.float32))

    class WindowBenchExperiment(CrowdExperiment):
        """Flagship crowd experiment over the memmap-backed splits."""

        def _load_databases(self):
            labeled = load_split(db["paths"]["labeled_images"],
                                 db["paths"]["labeled_density"])
            unlabeled = load_split(db["paths"]["unlabeled_images"])
            validation = synthetic_crowd_database(
                2, height=H, width=W, max_heads=20, sigma=10.0,
                label_type="density", seed=7)
            return labeled, unlabeled, validation, validation

    settings = Settings(
        trial_name="window_bench", logs_directory="/tmp/srgan_window_bench",
        batch_size=args.batch, image_patch_size=args.patch,
        model_base_width=args.base_width, latent_dimension=100,
        steps_to_run=0, seed=0, compute_dtype="bfloat16",
        crowd_hbm_window=args.window, crowd_window_slices=args.slices,
        crowd_window_refresh_period=args.refresh_period,
        crowd_label_dtype=args.label_dtype)
    exp = WindowBenchExperiment(settings)
    exp.dataset_setup()
    models, d_params, g_params, dnn_params = exp.model_setup()
    exp.models = models
    exp.state = init_train_state(settings, d_params, g_params, dnn_params)
    exp.prepare_mesh()
    t0 = time.perf_counter()
    exp.prepare_train_step()  # includes the initial window uploads
    upload_secs = time.perf_counter() - t0
    window_bytes = sum(
        int(np.prod(a.shape)) * a.dtype.itemsize
        for w in exp._windows for a in w.arrays.values())
    print(f"window_bench: initial {window_bytes / 1e9:.2f} GB window "
          f"upload in {upload_secs:.0f} s "
          f"({window_bytes / 1e9 / upload_secs * 1e3:.0f} MB/s)",
          file=sys.stderr, flush=True)

    # The production input path: epoch_batch_iterators includes the
    # per-step window refresh hook.
    epochs = exp.epoch_batch_iterators()
    batches = (b for epoch in epochs for b in epoch)
    from srgan_tpu.utils.seeding import KeySequence
    keys = KeySequence(settings.seed, "train")

    def one_step():
        patches, labels, upatches = next(batches)
        exp.state, metrics = exp._train_step(
            exp.state, patches, labels, upatches, keys.next())
        return metrics

    def sync(metrics):
        return float(np.asarray(
            jax.device_get(metrics["d_total_loss"])).ravel()[-1])

    if args.warmup:
        for _ in range(args.warmup):
            metrics = one_step()
        sync(metrics)
    refreshes_before = [w.refresh_count for w in exp._windows]

    start = time.perf_counter()
    for _ in range(args.steps):
        metrics = one_step()
    sync(metrics)
    elapsed = time.perf_counter() - start

    refreshes = [w.refresh_count - b
                 for w, b in zip(exp._windows, refreshes_before)]
    slice_bytes = [
        sum(int(np.prod(a.shape[1:])) * a.dtype.itemsize
            for a in w.arrays.values()) * w.slice_size
        for w in exp._windows]
    refreshed_bytes = sum(r * b for r, b in zip(refreshes, slice_bytes))
    total_bytes = (db["n_lab"] * BYTES_PER_LABELED
                   + db["n_unl"] * BYTES_PER_UNLABELED)
    refresh_mb_s = refreshed_bytes / 1e6 / elapsed
    images_per_sec = args.batch * args.steps / elapsed
    result = {
        "metric": "crowd_srgan_images_per_sec_window_tier",
        "value": round(images_per_sec, 2),
        "unit": "images/sec/chip",
        "database_gb": round(total_bytes / 1e9, 1),
        "window_examples": args.window,
        "window_gb": round(window_bytes / 1e9, 2),
        "refreshes_in_timed_region": refreshes,
        "refresh_mb_per_sec": round(refresh_mb_s, 1),
        "full_rotation_minutes": (
            round(total_bytes / 1e6 / refresh_mb_s / 60, 1)
            if refresh_mb_s > 0 else None),
        "vs_host_tier": round(images_per_sec / 73.8, 2),
    }
    print(json.dumps(result))
    exp.close()


if __name__ == "__main__":
    main()
