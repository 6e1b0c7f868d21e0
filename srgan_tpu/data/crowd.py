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
                     k: int = 1) -> np.ndarray:
    """Per-pixel mean distance to the k nearest annotated heads.

    Reference: the crowd-paper branch's kNN-distance maps (SURVEY.md §2
    6c, arXiv:1902.05379 [M]) — an alternative regression target that is
    well-defined even far from any head. Empty annotation → the map is
    the distance to the image diagonal (max possible), matching the
    "no crowd anywhere" reading.
    """
    heads = np.asarray(head_positions, np.float32).reshape(-1, 2)
    yy, xx = np.mgrid[0:height, 0:width].astype(np.float32)
    if len(heads) == 0:
        diag = np.float32(np.hypot(height, width))
        return np.full((height, width), diag, np.float32)
    k = min(k, len(heads))
    # [H, W, M] pairwise distances; M is modest after preprocessing.
    d = np.sqrt((yy[..., None] - heads[None, None, :, 0]) ** 2
                + (xx[..., None] - heads[None, None, :, 1]) ** 2)
    if k == 1:
        return d.min(axis=-1).astype(np.float32)
    part = np.partition(d, k - 1, axis=-1)[..., :k]
    return part.mean(axis=-1).astype(np.float32)


def generate_iknn_map(head_positions: np.ndarray, height: int, width: int,
                      k: int = 1, epsilon: float = 1.0) -> np.ndarray:
    """Inverse kNN map: ``1 / (knn + ε)`` — bounded, crowd-density-like
    response that the crowd-paper branch regresses instead of raw kNN
    distance (iKNN maps [M])."""
    return (1.0 / (generate_knn_map(head_positions, height, width, k)
                   + epsilon)).astype(np.float32)


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

    def __post_init__(self):
        assert self.images.ndim == 4 and self.images.shape[3] == 3
        assert self.density_maps.shape == self.images.shape[:3]
        assert len(self.head_counts) == len(self.images)

    def __len__(self) -> int:
        return len(self.images)

    @property
    def image_size(self) -> Tuple[int, int]:
        return self.images.shape[1], self.images.shape[2]

    def save(self, path: str) -> None:
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        arrays = dict(images=self.images, density_maps=self.density_maps,
                      head_counts=self.head_counts,
                      label_type=np.asarray(self.label_type))
        if self.aux_maps is not None:
            arrays["aux_maps"] = self.aux_maps
        np.savez_compressed(path, **arrays)

    @classmethod
    def load(cls, path: str) -> "CrowdDatabase":
        data = np.load(path)
        return cls(images=data["images"],
                   density_maps=data["density_maps"],
                   head_counts=data["head_counts"],
                   aux_maps=(data["aux_maps"]
                             if "aux_maps" in data else None),
                   label_type=(str(data["label_type"])
                               if "label_type" in data else "density"))


# --------------------------------------------------------------------------
# Offline preprocessors (reference: crowd/database_preprocessor.py [A][H]).
# --------------------------------------------------------------------------

class DatabasePreprocessor:
    """Raw database directory → fixed-resolution :class:`CrowdDatabase`.

    Subclasses implement :meth:`example_paths` (image/annotation pairs) and
    :meth:`load_head_positions`. `preprocess` resizes every image to
    (height, width), scales head coordinates accordingly, renders density
    maps, and returns the packed arrays.
    """

    database_name = "base"

    def __init__(self, height: int = 384, width: int = 512,
                 sigma: float = 8.0, label_type: str = "density",
                 knn_k: int = 1):
        if label_type not in ("density", "knn", "iknn"):
            raise ValueError(f"unknown label_type {label_type!r}; "
                             f"choose density, knn or iknn")
        self.height = height
        self.width = width
        self.sigma = sigma
        self.label_type = label_type
        self.knn_k = knn_k

    # -------------------------------------------------- subclass interface
    def example_paths(self, raw_directory: str):
        """Yield (image_path, annotation_path) pairs."""
        raise NotImplementedError

    def load_head_positions(self, annotation_path: str) -> np.ndarray:
        """Return [M, 2] float32 (x, y) head positions in raw-image pixels."""
        raise NotImplementedError

    # ---------------------------------------------------------- pipeline
    def preprocess(self, raw_directory: str,
                   output_path: Optional[str] = None) -> CrowdDatabase:
        from PIL import Image

        images, densities, counts, aux = [], [], [], []
        for image_path, ann_path in self.example_paths(raw_directory):
            with Image.open(image_path) as img:
                img = img.convert("RGB")
                raw_w, raw_h = img.size
                resized = np.asarray(
                    img.resize((self.width, self.height), Image.BILINEAR),
                    np.uint8)
            heads_xy = self.load_head_positions(ann_path)
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
            images.append(resized)
            densities.append(density)
            counts.append(float(len(heads_yx)))
        database = CrowdDatabase(
            images=np.stack(images) if images else
            np.zeros((0, self.height, self.width, 3), np.uint8),
            density_maps=np.stack(densities).astype(np.float32) if densities
            else np.zeros((0, self.height, self.width), np.float32),
            head_counts=np.asarray(counts, np.float32),
            aux_maps=(np.stack(aux).astype(np.float32)
                      if aux else None),
            label_type=self.label_type)
        if output_path:
            database.save(output_path)
        return database


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
    args = parser.parse_args(argv)
    pre = PREPROCESSORS[args.database](height=args.height,
                                       width=args.width, sigma=args.sigma,
                                       label_type=args.label_type,
                                       knn_k=args.knn_k)
    db = pre.preprocess(args.raw_directory, args.output_path)
    print(f"wrote {len(db)} examples "
          f"({args.height}x{args.width}) to {args.output_path}")
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
