"""Crowd-counting data: offline preprocessing + on-device patch sampling.

Reference: crowd/database_preprocessor.py (DatabasePreprocessor + per-DB
subclasses), crowd/label_generation.py (generate_density_label),
crowd/data.py (CrowdExample records, patch/flip/normalize transforms,
test-time patch grid) [A][H]; SURVEY.md §3.3.

Split of responsibilities (TPU-first):
* OFFLINE (host, once per database): unpack annotations (.mat head
  positions), resize images to the framework's fixed training resolution,
  scale head coordinates, store one ``.npz`` per split. Fixed resolution →
  static shapes → one XLA compilation.
* ONLINE (device, per step): the split's image + density arrays live in
  HBM; random patch selection, flip and normalization run through the
  Pallas input kernel (srgan_tpu/ops/patches.py) — nothing but small index
  arrays crosses the host↔device boundary per step. This replaces the
  reference's per-sample NumPy/PIL DataLoader workers, its documented
  input bottleneck (SURVEY.md §3.2).
"""

from __future__ import annotations

import dataclasses
import glob
import os
from typing import Dict, Optional, Tuple

import numpy as np

from srgan_tpu.ops.density import density_maps_reference


# --------------------------------------------------------------------------
# Label generation (reference: crowd/label_generation.py [A][H]).
# --------------------------------------------------------------------------

def generate_density_label(head_positions: np.ndarray, height: int,
                           width: int, sigma: float = 8.0) -> np.ndarray:
    """Render one Gaussian density map on the host (offline path).

    Each head contributes a unit-mass Gaussian; Σ map == head count.
    """
    heads = np.asarray(head_positions, np.float32).reshape(1, -1, 2)
    counts = np.array([heads.shape[1]], np.int32)
    return density_maps_reference(heads, counts, sigma, height, width)[0]


def generate_knn_map(head_positions: np.ndarray, height: int, width: int,
                     k: int = 1, origin: Tuple[float, float] = (0.0, 0.0),
                     empty_value: Optional[float] = None,
                     _chunk: int = 64) -> np.ndarray:
    """Per-pixel mean distance to the k nearest annotated heads.

    Reference: the crowd-paper branch's kNN-distance maps (SURVEY.md §2
    6c, arXiv:1902.05379 [M]) — an alternative regression target that is
    well-defined even far from any head. Empty annotation → the map is
    the distance to the image diagonal (max possible), matching the
    "no crowd anywhere" reading.

    Computed with a scipy cKDTree (O(pixels · k·log heads)): the
    head-chunked brute force this replaces measured ~27 min per
    12k-head UCF-QNRF image at native tile resolution
    (tools/ucf_qnrf_rehearsal.py found it; the tree form is ~100x
    faster at that scale and bit-compatible within f32 rounding — the
    chunked golden form survives as ``_generate_knn_map_chunked`` and a
    parity test). ``origin`` offsets the pixel grid, so a tile of a
    larger image can be evaluated against ALL of the image's heads in
    the global frame (native-resolution tiled preprocessing).
    """
    del _chunk  # golden-form parameter; kept for signature compatibility
    heads = np.asarray(head_positions, np.float64).reshape(-1, 2)
    if len(heads) == 0:
        # "No crowd anywhere" → the maximum possible distance. For a TILE
        # of a larger canvas the tile diagonal would UNDERSTATE it (a
        # zero-head image must not read as closer crowd than a far-away
        # one), so tile callers pass the source-canvas diagonal.
        diag = np.float32(empty_value if empty_value is not None
                          else np.hypot(height, width))
        return np.full((height, width), diag, np.float32)
    from scipy.spatial import cKDTree

    oy, ox = origin
    yy, xx = np.mgrid[0:height, 0:width].astype(np.float64)
    points = np.stack([yy.ravel() + oy, xx.ravel() + ox], axis=-1)
    k = min(k, len(heads))
    distances, _ = cKDTree(heads).query(points, k=k)
    if k > 1:
        distances = distances.mean(axis=-1)
    return distances.reshape(height, width).astype(np.float32)


def _generate_knn_map_chunked(head_positions: np.ndarray, height: int,
                              width: int, k: int = 1,
                              origin: Tuple[float, float] = (0.0, 0.0),
                              empty_value: Optional[float] = None,
                              _chunk: int = 64) -> np.ndarray:
    """Brute-force golden form of :func:`generate_knn_map` (head-chunked
    running top-k, [H, W, k + chunk] peak memory). Kept as the
    independent implementation the tree form is parity-tested against."""
    heads = np.asarray(head_positions, np.float32).reshape(-1, 2)
    oy, ox = origin
    yy, xx = np.mgrid[0:height, 0:width].astype(np.float32)
    yy += np.float32(oy)
    xx += np.float32(ox)
    if len(heads) == 0:
        diag = np.float32(empty_value if empty_value is not None
                          else np.hypot(height, width))
        return np.full((height, width), diag, np.float32)
    k = min(k, len(heads))
    best = np.full((height, width, k), np.inf, np.float32)
    for start in range(0, len(heads), _chunk):
        chunk = heads[start:start + _chunk]
        d = np.sqrt((yy[..., None] - chunk[None, None, :, 0]) ** 2
                    + (xx[..., None] - chunk[None, None, :, 1]) ** 2)
        merged = np.concatenate([best, d], axis=-1)
        if k == 1:
            best = merged.min(axis=-1, keepdims=True)
        else:
            best = np.partition(merged, k - 1, axis=-1)[..., :k]
    return best.mean(axis=-1).astype(np.float32)


def generate_iknn_map(head_positions: np.ndarray, height: int, width: int,
                      k: int = 1, epsilon: float = 1.0,
                      origin: Tuple[float, float] = (0.0, 0.0),
                      empty_value: Optional[float] = None) -> np.ndarray:
    """Inverse kNN map: ``1 / (knn + ε)`` — bounded, crowd-density-like
    response that the crowd-paper branch regresses instead of raw kNN
    distance (iKNN maps [M])."""
    return (1.0 / (generate_knn_map(head_positions, height, width, k,
                                    origin=origin,
                                    empty_value=empty_value)
                   + epsilon)).astype(np.float32)


def polygon_roi_mask(xs: np.ndarray, ys: np.ndarray, height: int,
                     width: int) -> np.ndarray:
    """Rasterize a region-of-interest polygon to a [H, W] uint8 mask.

    Reference: WorldExpo'10 per-scene ROI polygons (SURVEY.md §2 6c [L])
    — evaluation counts predicted density only inside the ROI.
    """
    from PIL import Image, ImageDraw

    img = Image.new("L", (width, height), 0)
    points = [(float(x), float(y)) for x, y in zip(np.ravel(xs),
                                                   np.ravel(ys))]
    ImageDraw.Draw(img).polygon(points, fill=1, outline=1)
    return np.asarray(img, np.uint8)


def render_density_windowed(head_positions: np.ndarray, height: int,
                            width: int, sigma: float = 8.0,
                            radius_sigmas: float = 4.0) -> np.ndarray:
    """Render a native-resolution density canvas with per-head windows.

    Equivalent to :func:`generate_density_label` but O(heads·r²) instead
    of O(heads·H·W): each head's Gaussian is rendered into a ±r window
    (r = ``radius_sigmas``·σ) clipped at the canvas border, normalized to
    unit mass over that clipped window — so Σ canvas == head count
    exactly, and values match the full-canvas renderer to the Gaussian's
    tail mass beyond r (≈3e-8 of a splat at 4σ). Used by the
    native-resolution tiled preprocessing mode, where canvases reach
    thousands of pixels per side and the full-canvas form is quadratic.
    """
    heads = np.asarray(head_positions, np.float32).reshape(-1, 2)
    canvas = np.zeros((height, width), np.float32)
    if len(heads) == 0:
        return canvas
    r = int(np.ceil(radius_sigmas * sigma))
    inv = 1.0 / (2.0 * sigma * sigma)
    for hy, hx in heads:
        y0 = max(0, int(np.floor(hy)) - r)
        y1 = min(height, int(np.floor(hy)) + r + 1)
        x0 = max(0, int(np.floor(hx)) - r)
        x1 = min(width, int(np.floor(hx)) + r + 1)
        if y0 >= y1 or x0 >= x1:
            # Head annotated beyond r of the canvas: the full-canvas
            # renderer also drops it (its window sum underflows the
            # 1e-12 guard) — skip for exact parity.
            continue
        yy, xx = np.mgrid[y0:y1, x0:x1].astype(np.float32)
        g = np.exp(-((yy - hy) ** 2 + (xx - hx) ** 2) * inv)
        total = g.sum()
        if total > 1e-12:
            canvas[y0:y1, x0:x1] += g / total
    return canvas


# --------------------------------------------------------------------------
# Database container.
# --------------------------------------------------------------------------

@dataclasses.dataclass
class CrowdDatabase:
    """One split of a preprocessed crowd database (fixed-size arrays).

    images:         [N, H, W, 3] uint8 (raw pixels; normalization happens
                    in the Pallas kernel / XLA graph)
    density_maps:   [N, H, W] float32, Σ per map == head count
    head_counts:    [N] float32 total heads per image
    """
    images: np.ndarray
    density_maps: np.ndarray
    head_counts: np.ndarray
    # Optional alternative regression targets (kNN / iKNN maps of the
    # crowd-paper branch [M]); same [N, H, W] shape when present.
    aux_maps: Optional[np.ndarray] = None
    # What aux_maps contains ('density' when absent) — persisted so a
    # label-type mismatch between database and Settings is detectable.
    label_type: str = "density"
    # Native-resolution tiled databases (preprocessing --mode tiles):
    # example n is a fixed-size tile of source image image_ids[n], at the
    # image's ORIGINAL pixel scale; per-image metrics aggregate tiles by
    # id. None → one example per source image (resize mode).
    image_ids: Optional[np.ndarray] = None
    # Per-example region-of-interest masks [N, H, W] uint8 (WorldExpo'10
    # per-scene ROI polygons [L]): evaluation counts predicted density
    # only where mask == 1. None → whole image.
    roi_masks: Optional[np.ndarray] = None
    # Per-channel pixel statistics in [0,1] scale ([3] float32), computed
    # at preprocess time for Settings.image_normalization='meanstd'
    # (reference: "mean/std or [-1,1] normalization", SURVEY §2 6c [H]).
    # None (older npz files) → image_statistics() computes them on load.
    image_mean: Optional[np.ndarray] = None
    image_std: Optional[np.ndarray] = None

    def __post_init__(self):
        assert self.images.ndim == 4 and self.images.shape[3] == 3
        assert self.density_maps.shape == self.images.shape[:3]
        assert len(self.head_counts) == len(self.images)
        if self.image_ids is not None:
            assert len(self.image_ids) == len(self.images)
        if self.roi_masks is not None:
            assert self.roi_masks.shape == self.images.shape[:3]

    def __len__(self) -> int:
        return len(self.images)

    @property
    def image_size(self) -> Tuple[int, int]:
        return self.images.shape[1], self.images.shape[2]

    @property
    def num_source_images(self) -> int:
        if self.image_ids is None:
            return len(self.images)
        return int(self.image_ids.max()) + 1 if len(self.image_ids) else 0

    def image_statistics(self) -> Tuple[np.ndarray, np.ndarray]:
        """Per-channel (mean, std) of the pixels in [0,1] scale.

        Stored statistics (preprocess-time) win; otherwise computed here
        once and cached. Accumulated CHUNKED in float64 (sum / sum-of-
        squares over ~128 MB u8 slices): the previous whole-array
        ``astype(np.float64)`` materialized 8× the image bytes at once —
        found at 43 GB RSS by tools/real_scale_cli_rehearsal.py; at real
        UCF-QNRF tiles scale (~30 GB u8) it would OOM the host. f64
        keeps ~15 significant digits over ≤1e10-pixel sums, so the
        one-pass E[x²]−E[x]² variance is exact to ~1e-12 here. std is
        floored at 1e-3 so a constant channel can never divide by ~0.
        """
        if self.image_mean is None or self.image_std is None:
            total = np.zeros(3, np.float64)
            total_sq = np.zeros(3, np.float64)
            count = 0
            per_image = max(1, int(self.images[:1].nbytes))
            step = max(1, (128 << 20) // per_image)
            for i in range(0, len(self.images), step):
                chunk = (self.images[i:i + step].reshape(-1, 3)
                         .astype(np.float64) / 255.0)
                total += chunk.sum(axis=0)
                total_sq += np.square(chunk).sum(axis=0)
                count += len(chunk)
            mean = total / max(count, 1)
            var = np.maximum(total_sq / max(count, 1) - mean ** 2, 0.0)
            self.image_mean = mean.astype(np.float32)
            self.image_std = np.maximum(
                np.sqrt(var), 1e-3).astype(np.float32)
        return self.image_mean, self.image_std

    def roi_head_counts(self) -> np.ndarray:
        """Per-example ground-truth counts under the ROI convention.

        Without ROI masks this is ``head_counts``. With masks, the truth
        is the density mass INSIDE the ROI — symmetric with evaluation,
        which sums predicted density inside the ROI (WorldExpo protocol:
        both sides masked; scoring masked predictions against unmasked
        head counts would bias MAE upward by the out-of-ROI mass).
        Cached after first computation (the masked reduction is O(N·H·W)).
        """
        if self.roi_masks is None:
            return self.head_counts
        cached = getattr(self, "_roi_counts_cache", None)
        if cached is None:
            cached = (self.density_maps
                      * self.roi_masks.astype(np.float32)
                      ).sum(axis=(1, 2)).astype(np.float32)
            self._roi_counts_cache = cached
        return cached

    def per_image_counts(self, per_example: np.ndarray) -> np.ndarray:
        """Aggregate a per-example (per-tile) count vector to per-SOURCE-
        image totals. Identity for resize-mode databases."""
        per_example = np.asarray(per_example, np.float64)
        if self.image_ids is None:
            return per_example.astype(np.float32)
        return np.bincount(self.image_ids, weights=per_example,
                           minlength=self.num_source_images
                           ).astype(np.float32)

    def save(self, path: str, compress: bool = True) -> None:
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        arrays = dict(images=self.images, density_maps=self.density_maps,
                      head_counts=self.head_counts,
                      label_type=np.asarray(self.label_type))
        if self.aux_maps is not None:
            arrays["aux_maps"] = self.aux_maps
        if self.image_ids is not None:
            arrays["image_ids"] = self.image_ids
        if self.roi_masks is not None:
            arrays["roi_masks"] = self.roi_masks
        if self.image_mean is not None and self.image_std is not None:
            arrays["image_mean"] = self.image_mean
            arrays["image_std"] = self.image_std
        # compress=False: multi-GB tiles databases pay single-core zlib
        # minutes at save and a full decompress at EVERY training
        # startup; uncompressed trades disk for both (preprocess CLI
        # --no-compress).
        (np.savez_compressed if compress else np.savez)(path, **arrays)

    @classmethod
    def load(cls, path: str) -> "CrowdDatabase":
        data = np.load(path)
        # Bind each member once: NpzFile re-inflates a compressed member
        # on every __getitem__, so check-then-construct would decompress
        # the multi-GB label arrays twice.
        density_maps = data["density_maps"]
        head_counts = data["head_counts"]
        aux_maps = data["aux_maps"] if "aux_maps" in data else None
        # Fail fast on a corrupted label store: one NaN here would
        # otherwise surface steps later as NaN losses with no pointer
        # back to the data. aux_maps IS the training target for
        # knn/iknn databases, so it is validated too.
        for name, arr in (("density_maps", density_maps),
                          ("head_counts", head_counts),
                          ("aux_maps", aux_maps)):
            if arr is not None and not np.isfinite(arr).all():
                raise ValueError(
                    f"{path}: non-finite values in {name!r} — the "
                    f"database file is corrupted; re-run preprocessing")
        return cls(images=data["images"],
                   density_maps=density_maps,
                   head_counts=head_counts,
                   aux_maps=aux_maps,
                   label_type=(str(data["label_type"])
                               if "label_type" in data else "density"),
                   image_ids=(data["image_ids"]
                              if "image_ids" in data else None),
                   roi_masks=(data["roi_masks"]
                              if "roi_masks" in data else None),
                   image_mean=(data["image_mean"]
                               if "image_mean" in data else None),
                   image_std=(data["image_std"]
                              if "image_std" in data else None))


# --------------------------------------------------------------------------
# Offline preprocessors (reference: crowd/database_preprocessor.py [A][H]).
# --------------------------------------------------------------------------

class DatabasePreprocessor:
    """Raw database directory → fixed-size :class:`CrowdDatabase`.

    Subclasses implement :meth:`example_paths` (image/annotation pairs) and
    :meth:`load_head_positions`. Two modes (both produce static shapes —
    one XLA compilation):

    * ``mode='resize'`` (reference-era framework default): every image is
      resized to (height, width), head coordinates scaled, one example
      per image.
    * ``mode='tiles'``: images keep their NATIVE pixel scale and are cut
      into non-overlapping (height, width) tiles (zero-padded at the
      bottom/right edges); density is rendered once on the native canvas
      and sliced, so head mass splits exactly across tile borders.
      ``image_ids`` maps tiles back to source images for per-image
      evaluation. This matches the reference's native-resolution arrays
      (SURVEY.md §3.3): a 6000px-wide UCF-QNRF image is NOT shrunk ~12×
      (which changes head scale and the task the MAE is defined on).
    """

    database_name = "base"

    def __init__(self, height: int = 384, width: int = 512,
                 sigma: float = 8.0, label_type: str = "density",
                 knn_k: int = 1, mode: str = "resize",
                 compress: bool = True):
        if label_type not in ("density", "knn", "iknn"):
            raise ValueError(f"unknown label_type {label_type!r}; "
                             f"choose density, knn or iknn")
        if mode not in ("resize", "tiles"):
            raise ValueError(f"unknown mode {mode!r}; "
                             f"choose resize or tiles")
        self.height = height
        self.width = width
        self.sigma = sigma
        self.label_type = label_type
        self.knn_k = knn_k
        self.mode = mode
        # Tiles-scale databases are multi-GB: single-core zlib costs
        # minutes at save AND a full decompress at every training
        # startup. --no-compress trades disk for both.
        self.compress = compress

    # -------------------------------------------------- subclass interface
    def example_paths(self, raw_directory: str):
        """Yield (image_path, annotation_path) pairs."""
        raise NotImplementedError

    def load_head_positions(self, annotation_path: str) -> np.ndarray:
        """Return [M, 2] float32 (x, y) head positions in raw-image pixels."""
        raise NotImplementedError

    def load_roi_mask(self, image_path: str, raw_h: int,
                      raw_w: int) -> Optional[np.ndarray]:
        """Optional [raw_h, raw_w] uint8 region-of-interest mask for one
        image (WorldExpo'10 per-scene ROI [L]); None → whole image."""
        return None

    # ------------------------------------------------- acquisition step
    ARCHIVE_SUFFIXES = (".zip", ".tar", ".tar.gz", ".tgz", ".tar.bz2")

    def resolve_raw_directory(self, raw: str) -> str:
        """The reference's offline entry starts from a downloaded archive
        (SURVEY.md §3.3 [M]: download → unpack → preprocess). Accepts:

        * a directory — used as-is;
        * an archive file — unpacked once into a sibling
          ``<archive>_unpacked`` directory (cached across runs);
        * a URL — downloaded first when ``SRGAN_ALLOW_DOWNLOAD=1`` is
          set; otherwise fails fast with manual instructions (this
          framework's standard environments have no network egress, and
          the crowd archives are multi-GB — an implicit download should
          never be a side effect of preprocessing).
        """
        if raw.startswith(("http://", "https://")):
            from urllib.parse import urlparse
            # basename of the URL PATH: query strings (signed mirror
            # links) must not leak into the local filename or the
            # archive-suffix check below.
            name = os.path.basename(urlparse(raw).path)
            target = os.path.join(os.getcwd(), name or "crowd_archive")
            if not os.path.exists(target):
                if os.environ.get("SRGAN_ALLOW_DOWNLOAD") != "1":
                    raise RuntimeError(
                        f"refusing to download {raw}: set "
                        f"SRGAN_ALLOW_DOWNLOAD=1 to allow, or download "
                        f"manually and pass the archive/directory path")
                import urllib.request
                # Stage + atomic rename (like the unpack step below): an
                # interrupted download must not leave a partial file the
                # next run's os.path.exists treats as complete.
                tmp = target + ".partial"
                urllib.request.urlretrieve(raw, tmp)
                os.replace(tmp, target)
            raw = target
        if os.path.isfile(raw):
            if not raw.endswith(self.ARCHIVE_SUFFIXES):
                raise ValueError(
                    f"{raw} is a file but not a supported archive "
                    f"{self.ARCHIVE_SUFFIXES}")
            for suffix in self.ARCHIVE_SUFFIXES:
                if raw.endswith(suffix):
                    base = raw[:-len(suffix)]
                    break
            unpacked = base + "_unpacked"
            if not os.path.isdir(unpacked):
                import shutil
                tmp = unpacked + ".partial"
                shutil.unpack_archive(raw, tmp)
                os.replace(tmp, unpacked)  # atomic: no half-unpacked dir
            return unpacked
        return raw

    # ---------------------------------------------------------- pipeline
    def preprocess(self, raw_directory: str,
                   output_path: Optional[str] = None) -> CrowdDatabase:
        from PIL import Image

        raw_directory = self.resolve_raw_directory(raw_directory)
        images, densities, counts, aux, ids, rois = [], [], [], [], [], []
        any_roi = False
        image_id = 0
        for image_path, ann_path in self.example_paths(raw_directory):
            with Image.open(image_path) as img:
                img = img.convert("RGB")
                raw_w, raw_h = img.size
                if self.mode == "tiles":
                    pixels = np.asarray(img, np.uint8)
                else:
                    pixels = np.asarray(
                        img.resize((self.width, self.height),
                                   Image.BILINEAR), np.uint8)
            heads_xy = self.load_head_positions(ann_path)
            # Corrupted annotations (NaN/inf points occur in real .mat
            # files) would silently NaN the whole image's density map;
            # drop them like any other unusable record.
            heads_xy = heads_xy[np.isfinite(heads_xy).all(axis=-1)]
            roi = self.load_roi_mask(image_path, raw_h, raw_w)
            any_roi = any_roi or roi is not None
            if roi is None:
                roi = np.ones((raw_h, raw_w), np.uint8)
            if self.mode == "tiles":
                heads_yx = (np.stack([heads_xy[:, 1], heads_xy[:, 0]],
                                     axis=-1)
                            if len(heads_xy) else np.zeros((0, 2),
                                                           np.float32))
                self._append_tiles(pixels, heads_yx, image_id, images,
                                   densities, counts, aux, ids,
                                   rois, roi)
            else:
                # raw (x, y) → resized (y, x)
                scale_x = self.width / raw_w
                scale_y = self.height / raw_h
                heads_yx = np.stack([heads_xy[:, 1] * scale_y,
                                     heads_xy[:, 0] * scale_x], axis=-1) \
                    if len(heads_xy) else np.zeros((0, 2), np.float32)
                density = generate_density_label(heads_yx, self.height,
                                                 self.width, self.sigma)
                if self.label_type == "knn":
                    aux.append(generate_knn_map(heads_yx, self.height,
                                                self.width, self.knn_k))
                elif self.label_type == "iknn":
                    aux.append(generate_iknn_map(heads_yx, self.height,
                                                 self.width, self.knn_k))
                images.append(pixels)
                densities.append(density)
                counts.append(float(len(heads_yx)))
                with Image.fromarray(roi * 255) as m:
                    rois.append((np.asarray(
                        m.resize((self.width, self.height),
                                 Image.NEAREST), np.uint8) > 0
                        ).astype(np.uint8))
            image_id += 1
        database = CrowdDatabase(
            images=np.stack(images) if images else
            np.zeros((0, self.height, self.width, 3), np.uint8),
            # astype(copy=False): the maps are already f32 — an eager
            # astype would duplicate the largest array of the database a
            # second time at exactly the multi-GB tiles scale.
            density_maps=(np.stack(densities).astype(np.float32,
                                                     copy=False)
                          if densities
                          else np.zeros((0, self.height, self.width),
                                        np.float32)),
            head_counts=np.asarray(counts, np.float32),
            aux_maps=(np.stack(aux).astype(np.float32, copy=False)
                      if aux else None),
            label_type=self.label_type,
            image_ids=(np.asarray(ids, np.int32)
                       if self.mode == "tiles" else None),
            # Emit validity masks whenever ANY pixel is excluded — by a
            # dataset ROI (any_roi) or by tiles-mode edge padding — so
            # predicted density over synthetic padding never counts
            # toward per-image totals; all-ones mask sets are dropped.
            roi_masks=(np.stack(rois)
                       if rois and (any_roi or
                                    any(m.min() == 0 for m in rois))
                       else None))
        # Per-database pixel statistics for the 'meanstd' normalization
        # variant (SURVEY §2 6c [H]), computed once here at preprocess
        # time and persisted with the arrays.
        if len(database):
            database.image_statistics()
        if output_path:
            database.save(output_path, compress=self.compress)
        return database

    def _append_tiles(self, pixels: np.ndarray, heads_yx: np.ndarray,
                      image_id: int, images, densities, counts, aux,
                      ids, rois, roi: np.ndarray) -> None:
        """Cut one native-resolution image into (height, width) tiles.

        Density is rendered ONCE on the (padded) native canvas — the
        windowed renderer keeps that linear in head count — then sliced,
        so a head near a tile border contributes its Gaussian mass to
        both tiles and the per-image total stays exactly the head count.
        Per-tile ``head_counts`` are therefore fractional; per-image
        metrics aggregate via ``image_ids``.
        """
        th, tw = self.height, self.width
        raw_h, raw_w = pixels.shape[:2]
        ny, nx = -(-raw_h // th), -(-raw_w // tw)
        padded = np.zeros((ny * th, nx * tw, 3), np.uint8)
        padded[:raw_h, :raw_w] = pixels
        padded_roi = np.zeros((ny * th, nx * tw), np.uint8)
        padded_roi[:raw_h, :raw_w] = roi
        canvas = render_density_windowed(heads_yx, ny * th, nx * tw,
                                         self.sigma)
        for ty in range(ny):
            for tx in range(nx):
                ys, xs = ty * th, tx * tw
                images.append(padded[ys:ys + th, xs:xs + tw])
                tile_density = canvas[ys:ys + th, xs:xs + tw]
                densities.append(tile_density)
                counts.append(float(tile_density.sum()))
                ids.append(image_id)
                rois.append(padded_roi[ys:ys + th, xs:xs + tw])
                # Empty-annotation fallback distance: the SOURCE canvas
                # diagonal (a tile's own diagonal would understate "no
                # crowd anywhere" relative to far-away crowd in other
                # images' tiles).
                diag = float(np.hypot(ny * th, nx * tw))
                if self.label_type == "knn":
                    aux.append(generate_knn_map(
                        heads_yx, th, tw, self.knn_k,
                        origin=(float(ys), float(xs)), empty_value=diag))
                elif self.label_type == "iknn":
                    aux.append(generate_iknn_map(
                        heads_yx, th, tw, self.knn_k,
                        origin=(float(ys), float(xs)), empty_value=diag))


class UcfQnrfPreprocessor(DatabasePreprocessor):
    """UCF-QNRF layout: ``img_0001.jpg`` + ``img_0001_ann.mat`` with key
    ``annPoints`` [M, 2] (x, y). Reference: crowd/database_preprocessor.py
    UCF-QNRF subclass [H]."""

    database_name = "ucf_qnrf"

    def example_paths(self, raw_directory: str):
        for image_path in sorted(glob.glob(
                os.path.join(raw_directory, "**", "img_*.jpg"),
                recursive=True)):
            ann = image_path[:-len(".jpg")] + "_ann.mat"
            if os.path.exists(ann):
                yield image_path, ann

    def load_head_positions(self, annotation_path: str) -> np.ndarray:
        from scipy.io import loadmat
        points = loadmat(annotation_path)["annPoints"]
        return np.asarray(points, np.float32).reshape(-1, 2)


class ShanghaiTechPreprocessor(DatabasePreprocessor):
    """ShanghaiTech layout: ``images/IMG_i.jpg`` + ``ground-truth/
    GT_IMG_i.mat`` with ``image_info[0,0]['location'][0,0]`` [M, 2] (x, y).
    Reference: crowd/database_preprocessor.py ShanghaiTech subclass [H]."""

    database_name = "shanghai_tech"

    def example_paths(self, raw_directory: str):
        for image_path in sorted(glob.glob(
                os.path.join(raw_directory, "**", "IMG_*.jpg"),
                recursive=True)):
            name = os.path.splitext(os.path.basename(image_path))[0]
            gt_dir = os.path.join(os.path.dirname(os.path.dirname(
                image_path)), "ground-truth")
            ann = os.path.join(gt_dir, f"GT_{name}.mat")
            if os.path.exists(ann):
                yield image_path, ann

    def load_head_positions(self, annotation_path: str) -> np.ndarray:
        from scipy.io import loadmat
        info = loadmat(annotation_path)["image_info"]
        points = info[0, 0][0, 0][0]
        return np.asarray(points, np.float32).reshape(-1, 2)


class UcfCc50Preprocessor(DatabasePreprocessor):
    """UCF-CC-50 layout: ``<i>.jpg`` + ``<i>_ann.mat`` with key
    ``annPoints`` [M, 2] (x, y) — same annotation schema as UCF-QNRF but
    bare numeric image names. Reference: crowd/database_preprocessor.py
    UCF-CC-50 subclass (SURVEY.md §2 6c [L])."""

    database_name = "ucf_cc_50"

    def example_paths(self, raw_directory: str):
        for image_path in sorted(glob.glob(
                os.path.join(raw_directory, "**", "*.jpg"),
                recursive=True)):
            ann = image_path[:-len(".jpg")] + "_ann.mat"
            if os.path.exists(ann):
                yield image_path, ann

    def load_head_positions(self, annotation_path: str) -> np.ndarray:
        from scipy.io import loadmat
        points = loadmat(annotation_path)["annPoints"]
        return np.asarray(points, np.float32).reshape(-1, 2)


class WorldExpoPreprocessor(DatabasePreprocessor):
    """WorldExpo'10 layout: scene frames ``<scene>_<frame>.jpg`` with an
    adjacent ``<same name>.mat`` annotation carrying ``point_position``
    [M, 2] (x, y). Reference: crowd/database_preprocessor.py World Expo
    subclass (SURVEY.md §2 6c [L] — the distribution splits labels into a
    sibling directory; co-locate each frame's .mat next to its .jpg, or
    symlink, before preprocessing)."""

    database_name = "world_expo"

    def example_paths(self, raw_directory: str):
        for image_path in sorted(glob.glob(
                os.path.join(raw_directory, "**", "*.jpg"),
                recursive=True)):
            ann = os.path.splitext(image_path)[0] + ".mat"
            if os.path.exists(ann):
                yield image_path, ann

    def load_head_positions(self, annotation_path: str) -> np.ndarray:
        from scipy.io import loadmat
        points = loadmat(annotation_path)["point_position"]
        points = np.asarray(points, np.float32)
        # Empty frames serialize as 0-d / (0, 0) arrays in the wild.
        if points.size == 0:
            return np.zeros((0, 2), np.float32)
        return points.reshape(-1, 2)

    def load_roi_mask(self, image_path: str, raw_h: int,
                      raw_w: int) -> Optional[np.ndarray]:
        """Per-scene ROI polygon (``roi.mat`` next to the frames, keys
        ``maskVerticesXCoordinates``/``maskVerticesYCoordinates`` —
        WorldExpo'10 distribution convention [L]); cached per scene.
        Evaluation then counts predicted density only inside the ROI."""
        scene_dir = os.path.dirname(image_path)
        key = (scene_dir, raw_h, raw_w)
        cache = getattr(self, "_roi_cache", None)
        if cache is None:
            cache = self._roi_cache = {}
        if key not in cache:
            roi_path = os.path.join(scene_dir, "roi.mat")
            if not os.path.exists(roi_path):
                cache[key] = None
            else:
                from scipy.io import loadmat
                data = loadmat(roi_path)
                cache[key] = polygon_roi_mask(
                    data["maskVerticesXCoordinates"],
                    data["maskVerticesYCoordinates"], raw_h, raw_w)
        return cache[key]


PREPROCESSORS: Dict[str, type] = {
    UcfQnrfPreprocessor.database_name: UcfQnrfPreprocessor,
    ShanghaiTechPreprocessor.database_name: ShanghaiTechPreprocessor,
    UcfCc50Preprocessor.database_name: UcfCc50Preprocessor,
    WorldExpoPreprocessor.database_name: WorldExpoPreprocessor,
}


# --------------------------------------------------------------------------
# Synthetic database (hermetic tests / benchmarking without the real data).
# --------------------------------------------------------------------------

def main(argv=None) -> int:
    """Offline preprocessing entry (reference:
    crowd/database_preprocessor.py:__main__ [A][H]):

    python -m srgan_tpu.data.crowd <raw_dir> <out.npz> \
        [--database ucf_qnrf|shanghai_tech] [--height H] [--width W]
        [--sigma S]
    """
    import argparse

    parser = argparse.ArgumentParser(
        prog="srgan_tpu.data.crowd",
        description="Preprocess a raw crowd database into a fixed-"
                    "resolution .npz split")
    parser.add_argument("raw_directory")
    parser.add_argument("output_path")
    parser.add_argument("--database", default="ucf_qnrf",
                        choices=sorted(PREPROCESSORS))
    parser.add_argument("--height", type=int, default=384)
    parser.add_argument("--width", type=int, default=512)
    parser.add_argument("--sigma", type=float, default=8.0)
    parser.add_argument("--label-type", default="density",
                        choices=["density", "knn", "iknn"])
    parser.add_argument("--knn-k", type=int, default=1)
    parser.add_argument("--mode", default="resize",
                        choices=["resize", "tiles"],
                        help="resize: one (height,width) example per "
                             "image; tiles: native-resolution "
                             "(height,width) tiles with image_ids for "
                             "per-image evaluation")
    parser.add_argument("--no-compress", action="store_true",
                        help="write an uncompressed .npz: multi-GB tiles "
                             "databases skip single-core zlib minutes at "
                             "save and a full decompress at every "
                             "training startup")
    args = parser.parse_args(argv)
    pre = PREPROCESSORS[args.database](height=args.height,
                                       width=args.width, sigma=args.sigma,
                                       label_type=args.label_type,
                                       knn_k=args.knn_k, mode=args.mode,
                                       compress=not args.no_compress)
    db = pre.preprocess(args.raw_directory, args.output_path)
    sources = (f" from {db.num_source_images} images"
               if db.image_ids is not None else "")
    print(f"wrote {len(db)} examples "
          f"({args.height}x{args.width}){sources} to {args.output_path}")
    return 0


def synthetic_crowd_database(count: int, height: int = 96, width: int = 128,
                             max_heads: int = 64, sigma: float = 4.0,
                             seed: int = 0,
                             label_type: str = "density",
                             knn_k: int = 1) -> CrowdDatabase:
    """Procedural crowd-like data with real signal: each head renders a
    bright blob into the image, so density/count are learnable from pixels.
    Used by tests and the bench harness (no real UCF-QNRF on this machine).
    ``label_type`` 'knn'/'iknn' additionally fills ``aux_maps``.
    """
    if label_type not in ("density", "knn", "iknn"):
        raise ValueError(f"unknown label_type {label_type!r}; "
                         f"choose density, knn or iknn")
    rng = np.random.default_rng(seed)
    images = np.zeros((count, height, width, 3), np.float32)
    densities = np.zeros((count, height, width), np.float32)
    aux = (np.zeros((count, height, width), np.float32)
           if label_type != "density" else None)
    counts = np.zeros((count,), np.float32)
    yy, xx = np.mgrid[0:height, 0:width].astype(np.float32)
    for i in range(count):
        n = int(rng.integers(0, max_heads + 1))
        heads = np.stack([rng.uniform(0, height, n),
                          rng.uniform(0, width, n)], axis=-1)
        if label_type == "knn":
            aux[i] = generate_knn_map(heads, height, width, knn_k)
        elif label_type == "iknn":
            aux[i] = generate_iknn_map(heads, height, width, knn_k)
        blob = np.zeros((height, width), np.float32)
        for hy, hx in heads:
            blob += np.exp(-((yy - hy) ** 2 + (xx - hx) ** 2)
                           / (2.0 * (2.5 * sigma) ** 2))
        # Brightness LINEAR in local blob density (no per-image max
        # normalization — that would decouple pixel values from count and
        # make the regression target nearly unlearnable).
        img = 40.0 + 140.0 * blob
        noise = rng.normal(0, 8.0, (height, width, 3))
        images[i] = np.clip(img[..., None] + noise, 0, 255)
        densities[i] = generate_density_label(heads, height, width, sigma)
        counts[i] = float(n)
    return CrowdDatabase(images=images.astype(np.uint8),
                         density_maps=densities, head_counts=counts,
                         aux_maps=aux, label_type=label_type)


if __name__ == "__main__":
    raise SystemExit(main())
