"""Pallas kernel tests in interpreter mode against NumPy golden models
(SURVEY.md §4: interpret-mode CPU tests vs reference implementations)."""

import jax.numpy as jnp
import numpy as np
import pytest

from srgan_tpu.ops.density import density_maps, density_maps_reference
from srgan_tpu.ops.patches import (extract_patches,
                                   extract_patches_reference,
                                   extract_rescaled_patches,
                                   extract_rescaled_patches_reference)


class TestDensityMaps:
    def _random_heads(self, b=2, n=16, h=32, w=48, seed=0):
        rng = np.random.default_rng(seed)
        heads = np.stack([rng.uniform(0, h, (b, n)),
                          rng.uniform(0, w, (b, n))],
                         axis=-1).astype(np.float32)
        counts = rng.integers(0, n + 1, (b,)).astype(np.int32)
        return heads, counts

    def test_matches_numpy_reference(self):
        heads, counts = self._random_heads()
        got = np.asarray(density_maps(jnp.asarray(heads),
                                      jnp.asarray(counts), 2.0,
                                      height=32, width=48, interpret=True))
        want = density_maps_reference(heads, counts, 2.0, 32, 48)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)

    def test_integral_equals_head_count(self):
        """SURVEY.md §4: Σ density == head count within ε, even for heads
        clipped at borders."""
        heads = np.array([[[0.0, 0.0], [16.0, 24.0], [31.0, 47.0]]],
                         np.float32)
        counts = np.array([3], np.int32)
        maps = np.asarray(density_maps(jnp.asarray(heads),
                                       jnp.asarray(counts), 3.0,
                                       height=32, width=48, interpret=True))
        np.testing.assert_allclose(maps.sum(), 3.0, rtol=1e-4)

    def test_zero_heads_gives_zero_map(self):
        heads = np.zeros((1, 4, 2), np.float32)
        counts = np.array([0], np.int32)
        maps = np.asarray(density_maps(jnp.asarray(heads),
                                       jnp.asarray(counts), 2.0,
                                       height=16, width=16, interpret=True))
        assert maps.sum() == 0.0

    def test_padding_heads_ignored(self):
        """Padded (invalid) head slots must not contribute mass."""
        heads = np.zeros((1, 8, 2), np.float32)
        heads[0, 0] = [8.0, 8.0]
        heads[0, 1:] = [2.0, 2.0]  # garbage padding
        counts = np.array([1], np.int32)
        maps = np.asarray(density_maps(jnp.asarray(heads),
                                       jnp.asarray(counts), 1.5,
                                       height=16, width=16, interpret=True))
        np.testing.assert_allclose(maps.sum(), 1.0, rtol=1e-4)
        assert maps[0, 8, 8] > maps[0, 2, 2]


class TestExtractPatches:
    def _data(self, b=3, h=24, w=40, c=3, p=8, seed=0):
        rng = np.random.default_rng(seed)
        images = rng.integers(0, 256, (b, h, w, c)).astype(np.float32)
        offsets = np.stack([rng.integers(0, h - p + 1, b),
                            rng.integers(0, w - p + 1, b)],
                           axis=-1).astype(np.int32)
        flips = rng.integers(0, 2, b).astype(np.int32)
        return images, offsets, flips

    def test_matches_numpy_reference(self):
        images, offsets, flips = self._data()
        got = np.asarray(extract_patches(
            jnp.asarray(images), jnp.asarray(offsets), jnp.asarray(flips),
            patch_size=8, interpret=True))
        want = extract_patches_reference(images, offsets, flips, 8)
        np.testing.assert_allclose(got, want, rtol=1e-6)

    def test_normalization_to_minus_one_one(self):
        """Reference's [-1, 1] normalization: x * 2/255 − 1."""
        images, offsets, flips = self._data()
        flips[:] = 0
        got = np.asarray(extract_patches(
            jnp.asarray(images), jnp.asarray(offsets), jnp.asarray(flips),
            patch_size=8, scale=2.0 / 255.0, shift=-1.0, interpret=True))
        assert got.min() >= -1.0 - 1e-6 and got.max() <= 1.0 + 1e-6
        want = extract_patches_reference(images, offsets, flips, 8,
                                         scale=2.0 / 255.0, shift=-1.0)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_flip_is_horizontal_only(self):
        images, offsets, _ = self._data(b=1)
        offsets[:] = 0
        noflip = np.asarray(extract_patches(
            jnp.asarray(images), jnp.asarray(offsets),
            jnp.zeros(1, jnp.int32), patch_size=8, interpret=True))
        flip = np.asarray(extract_patches(
            jnp.asarray(images), jnp.asarray(offsets),
            jnp.ones(1, jnp.int32), patch_size=8, interpret=True))
        np.testing.assert_allclose(flip, noflip[:, :, ::-1], rtol=1e-6)

    def test_uint8_images(self):
        """uint8 datasets: 32-row sublane alignment path + cast-normalize
        in kernel (4× HBM saving for crowd databases)."""
        rng = np.random.default_rng(9)
        images = rng.integers(0, 256, (3, 48, 40, 3)).astype(np.uint8)
        offsets = np.stack([rng.integers(0, 48 - 8 + 1, 3),
                            rng.integers(0, 40 - 8 + 1, 3)],
                           axis=-1).astype(np.int32)
        flips = rng.integers(0, 2, 3).astype(np.int32)
        got = np.asarray(extract_patches(
            jnp.asarray(images), jnp.asarray(offsets), jnp.asarray(flips),
            patch_size=8, scale=2 / 255.0, shift=-1.0, interpret=True))
        want = extract_patches_reference(images.astype(np.float32),
                                         offsets, flips, 8, 2 / 255.0,
                                         -1.0)
        np.testing.assert_allclose(got, want, rtol=1e-6)

    def test_uint8_height_requirement(self):
        # h == p leaves no room for an aligned DMA window even after the
        # H-pad → explicit error.
        with pytest.raises(ValueError, match="32"):
            extract_patches(jnp.zeros((1, 8, 40, 3), jnp.uint8),
                            jnp.zeros((1, 2), jnp.int32),
                            jnp.zeros((1,), jnp.int32),
                            patch_size=8, interpret=True)
        # h slightly above p used to be rejected; the H-pad makes it legal
        # and exact.
        rng = np.random.default_rng(2)
        images = rng.integers(0, 256, (2, 32, 40, 3)).astype(np.uint8)
        offsets = np.array([[0, 0], [32 - 8, 40 - 8]], np.int32)
        flips = np.zeros(2, np.int32)
        got = np.asarray(extract_patches(
            jnp.asarray(images), jnp.asarray(offsets), jnp.asarray(flips),
            patch_size=8, interpret=True))
        want = extract_patches_reference(images.astype(np.float32),
                                         offsets, flips, 8)
        np.testing.assert_allclose(got, want, rtol=1e-6)

    def test_dataset_gather_indices(self):
        """The input-queue path: B patches sampled by index from an
        N-image HBM-resident dataset (B != N, repeats allowed)."""
        images, _, _ = self._data(b=4)
        rng = np.random.default_rng(3)
        indices = np.array([2, 0, 2, 3, 1, 2], np.int32)
        offsets = np.stack([rng.integers(0, 24 - 8 + 1, 6),
                            rng.integers(0, 40 - 8 + 1, 6)],
                           axis=-1).astype(np.int32)
        flips = rng.integers(0, 2, 6).astype(np.int32)
        got = np.asarray(extract_patches(
            jnp.asarray(images), jnp.asarray(offsets), jnp.asarray(flips),
            patch_size=8, indices=jnp.asarray(indices), interpret=True))
        want = extract_patches_reference(images, offsets, flips, 8,
                                         indices=indices)
        assert got.shape == (6, 8, 8, 3)
        np.testing.assert_allclose(got, want, rtol=1e-6)

    def test_misaligned_height_keeps_dma_base_aligned(self):
        """Regression (ADVICE r1, medium): when (h − p) is NOT a sublane
        multiple the old clamp produced an unaligned DMA base, breaking
        the kernel's `pl.multiple_of` promise on real TPUs. The wrapper
        now pads H; values must stay exact even at the bottom-most
        offsets, and the alignment invariant must hold for EVERY valid
        oy."""
        rng = np.random.default_rng(5)
        h, w, p = 100, 40, 9  # uint8 sublane 32; (100−9) % 32 = 27 ≠ 0
        images = rng.integers(0, 256, (2, h, w, 3)).astype(np.uint8)
        offsets = np.array([[h - p, 3], [h - p - 1, 0]], np.int32)
        flips = np.array([0, 1], np.int32)
        got = np.asarray(extract_patches(
            jnp.asarray(images), jnp.asarray(offsets), jnp.asarray(flips),
            patch_size=p, interpret=True))
        want = extract_patches_reference(images.astype(np.float32),
                                         offsets, flips, p)
        np.testing.assert_allclose(got, want, rtol=1e-6)
        # Wrapper arithmetic replicated: base aligned, slice in bounds.
        sublane, rows_out = 32, p + 32
        pad_h = (sublane - (h - p) % sublane) % sublane
        for oy in range(0, h - p + 1):
            base = min((oy // sublane) * sublane, h + pad_h - rows_out)
            assert base % sublane == 0 and base >= 0
            assert 0 <= oy - base <= sublane
            assert base + rows_out <= h + pad_h

    def test_corner_offsets(self):
        images, _, _ = self._data(b=2, h=24, w=40, p=8)
        offsets = np.array([[0, 0], [24 - 8, 40 - 8]], np.int32)
        flips = np.zeros(2, np.int32)
        got = np.asarray(extract_patches(
            jnp.asarray(images), jnp.asarray(offsets), jnp.asarray(flips),
            patch_size=8, interpret=True))
        np.testing.assert_allclose(got[0], images[0, :8, :8], rtol=1e-6)
        np.testing.assert_allclose(got[1], images[1, -8:, -8:], rtol=1e-6)


class TestExtractRescaledPatches:
    """Random-rescale patch augmentation (SURVEY.md §2 6c '+rescale'):
    per-example source windows resized to the patch size, mass-preserving
    for density labels."""

    WINDOWS = (6, 8, 12)

    def _data(self, b=6, h=40, w=48, c=3, seed=0):
        rng = np.random.default_rng(seed)
        images = rng.integers(0, 256, (b, h, w, c)).astype(np.float32)
        scale_idx = rng.integers(0, len(self.WINDOWS), b).astype(np.int32)
        win = np.asarray(self.WINDOWS)[scale_idx]
        offsets = np.stack([rng.integers(0, h - win + 1),
                            rng.integers(0, w - win + 1)],
                           axis=-1).astype(np.int32)
        flips = rng.integers(0, 2, b).astype(np.int32)
        return images, offsets, flips, scale_idx

    def test_matches_golden_model(self):
        images, offsets, flips, scale_idx = self._data()
        got = np.asarray(extract_rescaled_patches(
            jnp.asarray(images), jnp.asarray(offsets), jnp.asarray(flips),
            jnp.asarray(scale_idx), patch_size=8,
            window_sizes=self.WINDOWS, scale=2.0 / 255.0, shift=-1.0,
            interpret=True))
        want = extract_rescaled_patches_reference(
            images, offsets, flips, scale_idx, 8, self.WINDOWS,
            scale=2.0 / 255.0, shift=-1.0)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_identity_window_equals_plain_extraction(self):
        """Factor 1.0 (window == patch size) must reproduce the plain
        patch path exactly — no resampling blur on unscaled examples."""
        images, offsets, flips, _ = self._data()
        scale_idx = np.full(len(images), 1, np.int32)  # window 8 == patch
        rng = np.random.default_rng(1)
        p = 8
        offsets = np.stack([rng.integers(0, 40 - p + 1, len(images)),
                            rng.integers(0, 48 - p + 1, len(images))],
                           axis=-1).astype(np.int32)
        got = np.asarray(extract_rescaled_patches(
            jnp.asarray(images), jnp.asarray(offsets), jnp.asarray(flips),
            jnp.asarray(scale_idx), patch_size=p,
            window_sizes=self.WINDOWS, interpret=True))
        want = np.asarray(extract_patches(
            jnp.asarray(images), jnp.asarray(offsets), jnp.asarray(flips),
            patch_size=p, interpret=True))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_preserve_mass_keeps_window_integral(self):
        """Density labels: the resized patch's integral must equal the
        source window's integral (head count in the window)."""
        rng = np.random.default_rng(2)
        density = rng.uniform(0, 1, (4, 40, 48, 1)).astype(np.float32)
        for i, ws in enumerate((6, 8, 12)):
            scale_idx = np.full(4, i, np.int32)
            offsets = np.stack([rng.integers(0, 40 - ws + 1, 4),
                                rng.integers(0, 48 - ws + 1, 4)],
                               axis=-1).astype(np.int32)
            got = np.asarray(extract_rescaled_patches(
                jnp.asarray(density), jnp.asarray(offsets),
                jnp.zeros(4, jnp.int32), jnp.asarray(scale_idx),
                patch_size=8, window_sizes=self.WINDOWS,
                preserve_mass=True, interpret=True))
            for j in range(4):
                oy, ox = offsets[j]
                window_mass = density[j, oy:oy + ws, ox:ox + ws].sum()
                np.testing.assert_allclose(got[j].sum(), window_mass,
                                           rtol=0.02,
                                           err_msg=f"window {ws}")

    def test_uint8_images(self):
        images, offsets, flips, scale_idx = self._data()
        u8 = images.astype(np.uint8)
        got = np.asarray(extract_rescaled_patches(
            jnp.asarray(u8), jnp.asarray(offsets), jnp.asarray(flips),
            jnp.asarray(scale_idx), patch_size=8,
            window_sizes=self.WINDOWS, scale=2.0 / 255.0, shift=-1.0,
            interpret=True))
        want = extract_rescaled_patches_reference(
            images, offsets, flips, scale_idx, 8, self.WINDOWS,
            scale=2.0 / 255.0, shift=-1.0)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_oversized_window_raises(self):
        with pytest.raises(ValueError, match="exceeds image"):
            extract_rescaled_patches(
                jnp.zeros((1, 16, 16, 3)), jnp.zeros((1, 2), jnp.int32),
                jnp.zeros(1, jnp.int32), jnp.zeros(1, jnp.int32),
                patch_size=8, window_sizes=(8, 24), interpret=True)


class TestPatchShapeFuzz:
    """Randomized shape matrix vs the NumPy golden model: odd heights,
    narrow widths, 1/3/5-channel, all three HBM dtypes, corner offsets —
    the alignment/pad proofs must hold for arbitrary user data, not just
    the shapes the fixed tests use."""

    @pytest.mark.parametrize("seed", range(8))
    def test_random_config_matches_reference(self, seed):
        from srgan_tpu.ops.patches import extract_patches_reference

        rng = np.random.default_rng(100 + seed)
        p = int(rng.choice([4, 8, 16]))
        h = p + int(rng.integers(0, 40))
        w = p + int(rng.integers(0, 40))
        c = int(rng.choice([1, 3, 5]))
        n = int(rng.integers(1, 5))
        b = int(rng.integers(1, 9))
        dtype = rng.choice(["float32", "uint8", "bfloat16"])
        base = rng.integers(0, 256, (n, h, w, c)).astype(np.float32)
        images = base.astype(np.uint8) if dtype == "uint8" else base
        offsets = np.stack([rng.integers(0, h - p + 1, b),
                            rng.integers(0, w - p + 1, b)],
                           axis=-1).astype(np.int32)
        # force true corner coverage into the batch
        offsets[0] = (h - p, w - p)
        if b > 1:
            offsets[1] = (0, 0)
        idx = rng.integers(0, n, b).astype(np.int32)
        flips = rng.integers(0, 2, b).astype(np.int32)
        dev_images = jnp.asarray(images)
        if dtype == "bfloat16":
            dev_images = dev_images.astype(jnp.bfloat16)
        got = np.asarray(extract_patches(
            dev_images, jnp.asarray(offsets), jnp.asarray(flips),
            patch_size=p, indices=jnp.asarray(idx), interpret=True))
        # golden model sees the SAME (rounded) values the kernel reads
        host = (np.asarray(dev_images.astype(jnp.float32))
                if dtype == "bfloat16" else images.astype(np.float32))
        want = extract_patches_reference(host, offsets, flips, p,
                                         indices=idx)
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6,
                                   err_msg=f"{dtype} {n}x{h}x{w}x{c} p={p}")

    @pytest.mark.parametrize("seed", range(6))
    def test_random_rescale_config_matches_reference(self, seed):
        from srgan_tpu.ops.patches import (extract_rescaled_patches,
                                           extract_rescaled_patches_reference)

        rng = np.random.default_rng(300 + seed)
        p = int(rng.choice([8, 16]))
        windows = tuple(sorted({int(round(p * f))
                                for f in rng.choice(
                                    [0.5, 0.75, 1.0, 1.25, 1.5], 3)}))
        wmax = max(windows)
        h = wmax + int(rng.integers(0, 30))
        w = wmax + int(rng.integers(0, 30))
        c = int(rng.choice([1, 3]))
        n = int(rng.integers(1, 4))
        b = int(rng.integers(1, 7))
        images = rng.random((n, h, w, c)).astype(np.float32) * 2e-2
        sidx = rng.integers(0, len(windows), b).astype(np.int32)
        # per-example bound: the example's OWN window must fit
        win = np.asarray(windows)[sidx]
        oy = (rng.random(b) * (h - win + 1)).astype(np.int32)
        ox = (rng.random(b) * (w - win + 1)).astype(np.int32)
        offsets = np.stack([oy, ox], axis=-1)
        offsets[0] = (h - win[0], w - win[0])  # corner case in-batch
        idx = rng.integers(0, n, b).astype(np.int32)
        flips = rng.integers(0, 2, b).astype(np.int32)
        mass = bool(rng.integers(0, 2))
        got = np.asarray(extract_rescaled_patches(
            jnp.asarray(images), jnp.asarray(offsets), jnp.asarray(flips),
            jnp.asarray(sidx), patch_size=p, window_sizes=windows,
            preserve_mass=mass, indices=jnp.asarray(idx), interpret=True))
        want = extract_rescaled_patches_reference(
            images, offsets, flips, sidx, p, windows,
            preserve_mass=mass, indices=idx)
        np.testing.assert_allclose(
            got, want, rtol=1e-5, atol=1e-7,
            err_msg=f"{n}x{h}x{w}x{c} p={p} windows={windows} mass={mass}")


class TestDensityShapeFuzz:
    """Randomized configs vs the NumPy golden model: off-canvas heads,
    zero-head images, odd map sizes, varied sigma — the mass guarantee
    (Σ map == head count) must hold for arbitrary annotations."""

    @pytest.mark.parametrize("seed", range(6))
    def test_random_config_matches_reference(self, seed):
        rng = np.random.default_rng(200 + seed)
        h = int(rng.integers(9, 70))
        w = int(rng.integers(9, 70))
        b = int(rng.integers(1, 5))
        cap = int(rng.integers(1, 12))
        sigma = float(rng.uniform(0.8, 6.0))
        # heads scattered INCLUDING off-canvas (clipped splats must
        # still carry their unit mass where they overlap the canvas)
        heads = np.stack([rng.uniform(-5, h + 5, (b, cap)),
                          rng.uniform(-5, w + 5, (b, cap))],
                         axis=-1).astype(np.float32)
        counts = rng.integers(0, cap + 1, (b,)).astype(np.int32)
        got = np.asarray(density_maps(jnp.asarray(heads),
                                      jnp.asarray(counts), sigma,
                                      height=h, width=w, interpret=True))
        want = density_maps_reference(heads, counts, sigma, h, w)
        np.testing.assert_allclose(
            got, want, rtol=1e-4, atol=1e-6,
            err_msg=f"b={b} {h}x{w} cap={cap} sigma={sigma:.2f}")
