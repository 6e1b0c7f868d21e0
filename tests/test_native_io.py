"""Native C++ IO runtime tests: npy mmap reader, crop gather vs NumPy
golden model, threaded prefetcher behavior."""

import numpy as np
import pytest

from srgan_tpu.io import (NativeDatasetReader, NativePrefetcher,
                          native_library_available)
from srgan_tpu.ops.patches import extract_patches_reference

pytestmark = pytest.mark.skipif(not native_library_available(),
                                reason="g++ unavailable")


def _write_npy(tmp_path, arr, name="data.npy"):
    path = str(tmp_path / name)
    np.save(path, arr)
    return path


class TestReader:
    def test_shape_dtype_u8(self, tmp_path):
        rng = np.random.default_rng(0)
        arr = rng.integers(0, 255, (3, 20, 24, 3)).astype(np.uint8)
        with NativeDatasetReader(_write_npy(tmp_path, arr)) as reader:
            assert reader.shape == (3, 20, 24, 3)
            assert reader.dtype == np.uint8

    def test_gather_matches_reference_u8(self, tmp_path):
        rng = np.random.default_rng(1)
        arr = rng.integers(0, 255, (4, 32, 40, 3)).astype(np.uint8)
        path = _write_npy(tmp_path, arr)
        indices = np.array([3, 0, 2, 2, 1], np.int32)
        offsets = np.stack([rng.integers(0, 32 - 8 + 1, 5),
                            rng.integers(0, 40 - 8 + 1, 5)],
                           axis=-1).astype(np.int32)
        flips = np.array([0, 1, 0, 1, 1], np.int32)
        with NativeDatasetReader(path) as reader:
            got = reader.gather_crops(indices, offsets, flips, 8,
                                      scale=2.0 / 255.0, shift=-1.0)
        want = extract_patches_reference(arr.astype(np.float32), offsets,
                                         flips, 8, 2.0 / 255.0, -1.0,
                                         indices=indices)
        np.testing.assert_allclose(got, want, rtol=1e-6)

    def test_gather_matches_reference_f32(self, tmp_path):
        rng = np.random.default_rng(2)
        arr = rng.standard_normal((2, 16, 16, 1)).astype(np.float32)
        path = _write_npy(tmp_path, arr)
        indices = np.array([1, 0], np.int32)
        offsets = np.array([[0, 0], [8, 8]], np.int32)
        with NativeDatasetReader(path) as reader:
            got = reader.gather_crops(indices, offsets, None, 8)
        want = extract_patches_reference(arr, offsets,
                                         np.zeros(2, np.int32), 8,
                                         indices=indices)
        np.testing.assert_allclose(got, want, rtol=1e-6)

    def test_rejects_bad_file(self, tmp_path):
        bad = tmp_path / "bad.npy"
        bad.write_bytes(b"not a numpy file")
        with pytest.raises(OSError):
            NativeDatasetReader(str(bad))

    def test_rejects_wrong_ndim(self, tmp_path):
        path = _write_npy(tmp_path, np.zeros((4, 4), np.float32))
        with pytest.raises(OSError):
            NativeDatasetReader(path)


class TestPrefetcher:
    def test_batches_stream_and_values_come_from_dataset(self, tmp_path):
        # constant-per-image dataset → every crop pixel identifies its
        # source image regardless of offset/flip
        arr = np.stack([np.full((24, 24, 3), i * 10.0, np.float32)
                        for i in range(5)])
        path = _write_npy(tmp_path, arr)
        with NativeDatasetReader(path) as reader:
            with NativePrefetcher(reader, batch_size=6, patch_size=8,
                                  num_threads=3, seed=7) as pf:
                seen = set()
                for _ in range(10):
                    batch, idx = pf.next()
                    assert batch.shape == (6, 8, 8, 3)
                    for b in range(6):
                        expected = float(idx[b]) * 10.0
                        np.testing.assert_allclose(batch[b], expected)
                        seen.add(int(idx[b]))
                assert len(seen) > 1  # random sampling hits several images

    def test_patch_too_large_raises(self, tmp_path):
        path = _write_npy(tmp_path,
                          np.zeros((2, 8, 8, 3), np.float32))
        with NativeDatasetReader(path) as reader:
            with pytest.raises(ValueError):
                NativePrefetcher(reader, batch_size=2, patch_size=16)

    def test_params_allow_consistent_label_crops(self, tmp_path):
        """next_with_params → gathering a second (label) array with the
        returned params reproduces exactly the reference extraction."""
        rng = np.random.default_rng(5)
        images = rng.integers(0, 255, (4, 32, 32, 3)).astype(np.uint8)
        labels = rng.standard_normal((4, 32, 32, 1)).astype(np.float32)
        ipath = _write_npy(tmp_path, images, "img.npy")
        lpath = _write_npy(tmp_path, labels, "lab.npy")
        with NativeDatasetReader(ipath) as ir, \
                NativeDatasetReader(lpath) as lr:
            with NativePrefetcher(ir, batch_size=5, patch_size=8,
                                  scale=2 / 255.0, shift=-1.0) as pf:
                batch, idx, offs, flips = pf.next_with_params()
                label_crops = lr.gather_crops(idx, offs, flips, 8)
        want_img = extract_patches_reference(
            images.astype(np.float32), offs, flips, 8, 2 / 255.0, -1.0,
            indices=idx)
        want_lab = extract_patches_reference(labels, offs, flips, 8,
                                             indices=idx)
        np.testing.assert_allclose(batch, want_img, rtol=1e-6)
        np.testing.assert_allclose(label_crops, want_lab, rtol=1e-6)

    def test_throughput_smoke(self, tmp_path):
        """Prefetcher sustains batches without deadlock under load."""
        rng = np.random.default_rng(0)
        arr = rng.integers(0, 255, (8, 64, 64, 3)).astype(np.uint8)
        path = _write_npy(tmp_path, arr)
        with NativeDatasetReader(path) as reader:
            with NativePrefetcher(reader, batch_size=16, patch_size=32,
                                  queue_depth=2, num_threads=4) as pf:
                for _ in range(50):
                    batch, _ = pf.next()
                assert np.isfinite(batch).all()


class TestGatherShapeFuzz:
    """Randomized shapes/dtypes vs the NumPy golden model — the C++
    crop-gather must handle arbitrary dataset geometry, not just the
    fixed-test shapes."""

    @pytest.mark.parametrize("seed", range(6))
    def test_random_config_matches_reference(self, tmp_path, seed):
        rng = np.random.default_rng(400 + seed)
        p = int(rng.choice([4, 8, 16]))
        h = p + int(rng.integers(0, 30))
        w = p + int(rng.integers(0, 30))
        c = int(rng.choice([1, 3, 5]))
        n = int(rng.integers(1, 5))
        b = int(rng.integers(1, 9))
        u8 = bool(rng.integers(0, 2))
        base = rng.integers(0, 256, (n, h, w, c))
        arr = base.astype(np.uint8) if u8 else base.astype(np.float32)
        indices = rng.integers(0, n, b).astype(np.int32)
        offsets = np.stack([rng.integers(0, h - p + 1, b),
                            rng.integers(0, w - p + 1, b)],
                           axis=-1).astype(np.int32)
        offsets[0] = (h - p, w - p)  # corner case in-batch
        flips = rng.integers(0, 2, b).astype(np.int32)
        with NativeDatasetReader(_write_npy(tmp_path, arr)) as reader:
            got = reader.gather_crops(indices, offsets, flips, p)
        want = extract_patches_reference(arr.astype(np.float32), offsets,
                                         flips, p, indices=indices)
        np.testing.assert_allclose(
            got, want, rtol=1e-6, atol=1e-6,
            err_msg=f"{'u8' if u8 else 'f32'} {n}x{h}x{w}x{c} p={p}")


class TestUint8Prefetcher:
    """uint8-output prefetcher (VERDICT r3 #3): raw crops, no float
    expansion — the 4x transfer cut for the remote-device host tier."""

    def test_u8_batches_match_reference_crops(self, tmp_path):
        rng = np.random.default_rng(7)
        images = rng.integers(0, 255, (4, 32, 32, 3)).astype(np.uint8)
        path = _write_npy(tmp_path, images)
        with NativeDatasetReader(path) as reader:
            with NativePrefetcher(reader, batch_size=5, patch_size=8,
                                  output_dtype="uint8") as pf:
                batch, idx, offs, flips = pf.next_with_params()
        assert batch.dtype == np.uint8
        want = extract_patches_reference(
            images.astype(np.float32), offs, flips, 8, indices=idx)
        np.testing.assert_array_equal(batch.astype(np.float32), want)

    def test_u8_requires_u8_store(self, tmp_path):
        arr = np.zeros((2, 16, 16, 3), np.float32)
        with NativeDatasetReader(_write_npy(tmp_path, arr)) as reader:
            with pytest.raises(ValueError, match="uint8"):
                NativePrefetcher(reader, batch_size=2, patch_size=8,
                                 output_dtype="uint8")

    def test_u8_rejects_scale_shift(self, tmp_path):
        arr = np.zeros((2, 16, 16, 3), np.uint8)
        with NativeDatasetReader(_write_npy(tmp_path, arr)) as reader:
            with pytest.raises(ValueError, match="scale/shift"):
                NativePrefetcher(reader, batch_size=2, patch_size=8,
                                 scale=2 / 255.0, shift=-1.0,
                                 output_dtype="uint8")
