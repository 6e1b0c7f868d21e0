"""Crowd pipeline tests: label generation, preprocessors (against
synthetic .mat fixtures), and the end-to-end CrowdExperiment
(SURVEY.md §4: density integral, patch bounds, integration smoke)."""

import os

import numpy as np
import pytest
from scipy.io import savemat
from PIL import Image

from srgan_tpu.data.crowd import (CrowdDatabase, ShanghaiTechPreprocessor,
                                  UcfQnrfPreprocessor,
                                  generate_density_label,
                                  synthetic_crowd_database)
from srgan_tpu.settings import Settings


class TestLabelGeneration:
    def test_density_integral_is_head_count(self):
        heads = np.array([[10.0, 20.0], [30.0, 40.0], [5.0, 5.0]])
        density = generate_density_label(heads, 64, 64, sigma=4.0)
        np.testing.assert_allclose(density.sum(), 3.0, rtol=1e-4)

    def test_empty_heads(self):
        density = generate_density_label(np.zeros((0, 2)), 32, 32)
        assert density.shape == (32, 32) and density.sum() == 0.0


class TestKnnMaps:
    def test_knn_map_zero_at_heads_grows_away(self):
        from srgan_tpu.data.crowd import generate_knn_map
        heads = np.array([[8.0, 8.0]])
        m = generate_knn_map(heads, 16, 16, k=1)
        assert m[8, 8] == pytest.approx(0.0, abs=1e-6)
        assert m[0, 0] == pytest.approx(np.hypot(8, 8), rel=1e-5)

    def test_knn_k_mean_of_nearest(self):
        from srgan_tpu.data.crowd import generate_knn_map
        heads = np.array([[0.0, 0.0], [0.0, 4.0], [0.0, 100.0]])
        m = generate_knn_map(heads, 1, 8, k=2)
        # at (0, 2): distances 2, 2, 98 → mean of 2 nearest = 2
        assert m[0, 2] == pytest.approx(2.0, rel=1e-5)

    def test_knn_empty_heads_is_diagonal(self):
        from srgan_tpu.data.crowd import generate_knn_map
        m = generate_knn_map(np.zeros((0, 2)), 12, 16)
        np.testing.assert_allclose(m, np.hypot(12, 16), rtol=1e-6)

    def test_iknn_bounded_and_peaked_at_heads(self):
        from srgan_tpu.data.crowd import generate_iknn_map
        heads = np.array([[4.0, 4.0]])
        m = generate_iknn_map(heads, 9, 9, epsilon=1.0)
        assert m.max() == pytest.approx(1.0, rel=1e-5)  # at the head
        assert np.unravel_index(m.argmax(), m.shape) == (4, 4)
        assert m.min() > 0.0

    @pytest.mark.parametrize("seed", range(4))
    def test_knn_matches_brute_force(self, seed):
        """Full-field parity vs an O(P*M) brute-force model, with the
        chunked running top-k forced through multiple chunks."""
        from srgan_tpu.data.crowd import generate_knn_map

        rng = np.random.default_rng(700 + seed)
        h = int(rng.integers(5, 25))
        w = int(rng.integers(5, 25))
        m = int(rng.integers(1, 40))
        k = int(rng.integers(1, min(m, 4) + 1))
        heads = np.stack([rng.uniform(-3, h + 3, m),
                          rng.uniform(-3, w + 3, m)],
                         axis=-1).astype(np.float64)
        got = generate_knn_map(heads, h, w, k=k, _chunk=7)
        yy, xx = np.mgrid[0:h, 0:w]
        d = np.sqrt((yy[..., None] - heads[:, 0]) ** 2
                    + (xx[..., None] - heads[:, 1]) ** 2)
        want = np.sort(d, axis=-1)[..., :k].mean(axis=-1)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5,
                                   err_msg=f"{h}x{w} m={m} k={k}")

    def test_preprocessor_label_type_roundtrip(self, tmp_path):
        from srgan_tpu.data.crowd import (CrowdDatabase,
                                          UcfQnrfPreprocessor)
        from scipy.io import savemat
        raw = tmp_path / "raw"
        raw.mkdir()
        _write_image(raw / "img_0001.jpg")
        savemat(raw / "img_0001_ann.mat",
                {"annPoints": np.array([[10.0, 20.0]])})
        pre = UcfQnrfPreprocessor(height=40, width=60, sigma=3.0,
                                  label_type="iknn")
        db = pre.preprocess(str(raw), str(tmp_path / "db.npz"))
        assert db.aux_maps is not None and db.aux_maps.shape == (1, 40, 60)
        loaded = CrowdDatabase.load(str(tmp_path / "db.npz"))
        np.testing.assert_array_equal(loaded.aux_maps, db.aux_maps)
        # density map still carried for counts
        np.testing.assert_allclose(loaded.density_maps.sum(), 1.0,
                                   rtol=1e-3)


class TestWindowedDensityRenderer:
    def test_matches_full_canvas_renderer(self):
        from srgan_tpu.data.crowd import render_density_windowed
        rng = np.random.default_rng(0)
        heads = np.stack([rng.uniform(0, 64, 12), rng.uniform(0, 96, 12)],
                         axis=-1)
        full = generate_density_label(heads, 64, 96, sigma=3.0)
        windowed = render_density_windowed(heads, 64, 96, sigma=3.0)
        np.testing.assert_allclose(windowed, full, atol=2e-5)
        np.testing.assert_allclose(windowed.sum(), 12.0, rtol=1e-5)

    def test_border_heads_keep_unit_mass(self):
        from srgan_tpu.data.crowd import render_density_windowed
        heads = np.array([[0.0, 0.0], [63.0, 95.0], [0.0, 95.0]])
        m = render_density_windowed(heads, 64, 96, sigma=4.0)
        np.testing.assert_allclose(m.sum(), 3.0, rtol=1e-5)

    def test_off_canvas_heads_match_full_renderer(self):
        """Slightly-off-canvas heads keep (most of) their mass at the
        border; far-off heads are dropped — both exactly as the
        full-canvas renderer treats them."""
        from srgan_tpu.data.crowd import render_density_windowed
        near = np.array([[-2.0, 20.0]])
        got = render_density_windowed(near, 32, 48, sigma=2.0)
        want = generate_density_label(near, 32, 48, sigma=2.0)
        np.testing.assert_allclose(got, want, atol=2e-5)
        np.testing.assert_allclose(got.sum(), 1.0, rtol=1e-5)
        far = np.array([[-50.0, 20.0]])
        got = render_density_windowed(far, 32, 48, sigma=2.0)
        want = generate_density_label(far, 32, 48, sigma=2.0)
        np.testing.assert_allclose(got, want, atol=1e-6)
        assert got.sum() == 0.0

    def test_empty(self):
        from srgan_tpu.data.crowd import render_density_windowed
        assert render_density_windowed(np.zeros((0, 2)), 16, 16).sum() == 0


class TestKnnChunking:
    def test_chunked_matches_single_chunk(self):
        """The running-top-k head chunking (memory fix for ~12k-head
        UCF-QNRF images) must be exact."""
        from srgan_tpu.data.crowd import generate_knn_map
        rng = np.random.default_rng(1)
        heads = np.stack([rng.uniform(0, 32, 150),
                          rng.uniform(0, 48, 150)], axis=-1)
        for k in (1, 3):
            small = generate_knn_map(heads, 32, 48, k=k, _chunk=7)
            big = generate_knn_map(heads, 32, 48, k=k, _chunk=1000)
            np.testing.assert_allclose(small, big, rtol=1e-6)

    def test_origin_offsets_pixel_grid(self):
        """A tile evaluated with origin=(y0,x0) must equal the matching
        slice of the full map (global distances, tile frame)."""
        from srgan_tpu.data.crowd import generate_knn_map
        rng = np.random.default_rng(2)
        heads = np.stack([rng.uniform(0, 40, 9),
                          rng.uniform(0, 60, 9)], axis=-1)
        full = generate_knn_map(heads, 40, 60, k=2)
        tile = generate_knn_map(heads, 20, 30, k=2, origin=(20.0, 30.0))
        np.testing.assert_allclose(tile, full[20:, 30:], rtol=1e-6)


class TestTiledPreprocessing:
    """--mode tiles: native-resolution fixed-size tiles + image_ids
    (SURVEY.md §3.3 native-resolution arrays; VERDICT r2 next #1b)."""

    def _preprocess(self, tmp_path, raw_h, raw_w, heads_xy, th=40, tw=60,
                    **kw):
        raw = tmp_path / "raw"
        raw.mkdir(exist_ok=True)
        _write_image(raw / "img_0001.jpg", h=raw_h, w=raw_w)
        savemat(raw / "img_0001_ann.mat", {"annPoints": heads_xy})
        pre = UcfQnrfPreprocessor(height=th, width=tw, sigma=3.0,
                                  mode="tiles", **kw)
        return pre.preprocess(str(raw))

    def test_tile_geometry_and_pixels(self, tmp_path):
        """80x120 image, 40x60 tiles → 2x2 grid; tile pixels are exact
        slices of the native image (NO resampling)."""
        from PIL import Image
        db = self._preprocess(tmp_path, 80, 120,
                              np.array([[10.0, 20.0]]))
        assert len(db) == 4
        np.testing.assert_array_equal(db.image_ids, [0, 0, 0, 0])
        assert db.num_source_images == 1
        with Image.open(tmp_path / "raw" / "img_0001.jpg") as img:
            native = np.asarray(img.convert("RGB"), np.uint8)
        np.testing.assert_array_equal(db.images[0], native[:40, :60])
        np.testing.assert_array_equal(db.images[3], native[40:, 60:120])

    def test_total_mass_is_head_count(self, tmp_path):
        """Density rendered on the native canvas then sliced: per-image
        mass (Σ over tiles) equals the head count even with heads on
        tile borders."""
        heads_xy = np.array([[60.0, 40.0],   # exactly on the tile cross
                             [20.0, 10.0], [100.0, 70.0]])
        db = self._preprocess(tmp_path, 80, 120, heads_xy)
        per_image = db.per_image_counts(db.head_counts)
        np.testing.assert_allclose(per_image, [3.0], rtol=1e-4)
        np.testing.assert_allclose(db.density_maps.sum(), 3.0, rtol=1e-4)
        # the border head split across tiles → fractional per-tile counts
        assert not np.allclose(db.head_counts,
                               np.round(db.head_counts))

    def test_padding_to_tile_multiple(self, tmp_path):
        """90x130 → 3x3 tile grid with zero-padded bottom/right edges."""
        db = self._preprocess(tmp_path, 90, 130,
                              np.array([[5.0, 5.0]]), th=40, tw=60)
        assert len(db) == 9
        # bottom-right tile is mostly padding: rows 80:90 real, rest zero
        assert db.images[8][10:, :].sum() == 0
        np.testing.assert_allclose(db.per_image_counts(db.head_counts),
                                   [1.0], rtol=1e-4)

    def test_padding_emits_validity_masks_without_roi(self, tmp_path):
        """No-ROI databases still get masks for tiles-mode edge padding
        (ADVICE r3: otherwise predicted density over the synthetic black
        padding counts toward per-image totals and biases MAE)."""
        db = self._preprocess(tmp_path, 90, 130,
                              np.array([[5.0, 5.0]]), th=40, tw=60)
        assert db.roi_masks is not None
        # bottom-right tile: only the 10x10 corner is real (image rows
        # 80:90 x cols 120:130), rest pad
        assert db.roi_masks[8][:10, :10].all()
        assert not db.roi_masks[8][10:, :].any()
        assert not db.roi_masks[8][:, 10:].any()
        # top-left tile is fully real
        assert db.roi_masks[0].all()

    def test_exactly_divisible_tiles_have_no_masks(self, tmp_path):
        """All-ones mask sets are dropped (no padding, no ROI) — no HBM
        cost for the common exactly-divisible case."""
        db = self._preprocess(tmp_path, 80, 120,
                              np.array([[10.0, 20.0]]))
        assert db.roi_masks is None

    def test_tiles_with_iknn_labels(self, tmp_path):
        """Tile aux maps use GLOBAL head distances in the tile frame."""
        from srgan_tpu.data.crowd import generate_iknn_map
        heads_xy = np.array([[10.0, 20.0], [100.0, 70.0]])  # (x, y)
        db = self._preprocess(tmp_path, 80, 120, heads_xy,
                              label_type="iknn")
        assert db.aux_maps is not None and db.aux_maps.shape == (4, 40, 60)
        heads_yx = heads_xy[:, ::-1]
        want_tile3 = generate_iknn_map(heads_yx, 40, 60,
                                       origin=(40.0, 60.0))
        np.testing.assert_allclose(db.aux_maps[3], want_tile3, rtol=1e-5)

    def test_empty_annotation_knn_uses_source_diagonal(self, tmp_path):
        """A zero-head image's tile kNN maps must use the SOURCE canvas
        diagonal, not the (much smaller) tile diagonal — otherwise 'no
        crowd anywhere' reads as closer crowd than far-away crowd
        (review r3)."""
        raw = tmp_path / "raw"
        raw.mkdir()
        _write_image(raw / "img_0001.jpg", h=80, w=120)
        savemat(raw / "img_0001_ann.mat",
                {"annPoints": np.zeros((0, 2))})
        pre = UcfQnrfPreprocessor(height=40, width=60, sigma=3.0,
                                  label_type="knn", mode="tiles")
        db = pre.preprocess(str(raw))
        np.testing.assert_allclose(db.aux_maps, np.hypot(80, 120),
                                   rtol=1e-6)

    def test_save_load_roundtrip_keeps_image_ids(self, tmp_path):
        db = self._preprocess(tmp_path, 80, 120, np.array([[10.0, 20.0]]))
        path = str(tmp_path / "tiles.npz")
        db.save(path)
        loaded = CrowdDatabase.load(path)
        np.testing.assert_array_equal(loaded.image_ids, db.image_ids)

    def test_per_image_counts_identity_without_ids(self):
        db = synthetic_crowd_database(3, height=32, width=32, seed=0)
        np.testing.assert_array_equal(db.per_image_counts(db.head_counts),
                                      db.head_counts)


class TestArchiveEntry:
    """The reference's offline acquisition step (download → unpack →
    preprocess, SURVEY §3.3 [M]): archives unpack once and cache; URLs
    fail fast without explicit opt-in (no implicit multi-GB downloads)."""

    def _make_archive(self, tmp_path):
        import shutil
        raw = tmp_path / "src"
        raw.mkdir()
        _write_image(raw / "img_0001.jpg")
        savemat(raw / "img_0001_ann.mat",
                {"annPoints": np.array([[10.0, 20.0]])})
        return shutil.make_archive(str(tmp_path / "qnrf"), "zip",
                                   root_dir=str(raw))

    def test_preprocess_from_archive(self, tmp_path):
        archive = self._make_archive(tmp_path)
        pre = UcfQnrfPreprocessor(height=40, width=60, sigma=3.0)
        db = pre.preprocess(archive)
        assert len(db) == 1 and db.head_counts[0] == 1.0
        # unpacked dir cached next to the archive for reuse
        assert os.path.isdir(str(tmp_path / "qnrf_unpacked"))
        again = pre.preprocess(archive)  # cache hit, same result
        np.testing.assert_array_equal(again.images, db.images)

    def test_url_refused_without_opt_in(self, tmp_path, monkeypatch):
        monkeypatch.delenv("SRGAN_ALLOW_DOWNLOAD", raising=False)
        pre = UcfQnrfPreprocessor()
        with pytest.raises(RuntimeError, match="SRGAN_ALLOW_DOWNLOAD"):
            pre.resolve_raw_directory("https://example.com/qnrf.zip")

    def test_non_archive_file_rejected(self, tmp_path):
        bad = tmp_path / "raw.txt"
        bad.write_text("not an archive")
        pre = UcfQnrfPreprocessor()
        with pytest.raises(ValueError, match="not a supported archive"):
            pre.resolve_raw_directory(str(bad))


class TestSyntheticDatabase:
    def test_shapes_and_mass(self):
        db = synthetic_crowd_database(4, height=48, width=64, max_heads=10,
                                      sigma=3.0, seed=0)
        assert db.images.shape == (4, 48, 64, 3)
        assert db.images.dtype == np.uint8
        for i in range(4):
            np.testing.assert_allclose(db.density_maps[i].sum(),
                                       db.head_counts[i], rtol=1e-3,
                                       atol=1e-4)

    def test_save_load_roundtrip(self, tmp_path):
        db = synthetic_crowd_database(2, height=32, width=32, seed=1)
        path = str(tmp_path / "db.npz")
        db.save(path)
        loaded = CrowdDatabase.load(path)
        np.testing.assert_array_equal(loaded.images, db.images)
        np.testing.assert_array_equal(loaded.density_maps, db.density_maps)


def _write_image(path, h=40, w=60):
    rng = np.random.default_rng(0)
    Image.fromarray(rng.integers(0, 255, (h, w, 3)).astype(np.uint8)
                    ).save(path)


class TestPreprocessors:
    def test_ucf_qnrf_layout(self, tmp_path):
        """Synthesize the UCF-QNRF on-disk layout (img_*.jpg +
        *_ann.mat['annPoints']) and check scaling + density mass."""
        raw = tmp_path / "raw"
        raw.mkdir()
        _write_image(raw / "img_0001.jpg", h=40, w=60)
        points_xy = np.array([[10.0, 20.0], [50.0, 30.0]])  # (x, y) raw px
        savemat(raw / "img_0001_ann.mat", {"annPoints": points_xy})

        pre = UcfQnrfPreprocessor(height=80, width=120, sigma=3.0)
        db = pre.preprocess(str(raw))
        assert db.images.shape == (1, 80, 120, 3)
        assert db.head_counts[0] == 2.0
        np.testing.assert_allclose(db.density_maps[0].sum(), 2.0, rtol=1e-3)
        # heads at raw (x,y)=(10,20),(50,30) → resized (y,x)=(40,20),(60,100)
        density = db.density_maps[0]
        background = np.median(density)
        assert density[40, 20] > background * 10 + 1e-4
        assert density[60, 100] > background * 10 + 1e-4

    def test_shanghai_tech_layout(self, tmp_path):
        raw = tmp_path / "part_A" / "train_data"
        (raw / "images").mkdir(parents=True)
        (raw / "ground-truth").mkdir()
        _write_image(raw / "images" / "IMG_1.jpg", h=40, w=60)
        points = np.array([[30.0, 20.0]])
        # image_info[0,0]['location'][0,0] == points
        location = np.empty((1, 1), object)
        location[0, 0] = points
        info = np.empty((1, 1), object)
        info[0, 0] = location
        savemat(raw / "ground-truth" / "GT_IMG_1.mat", {"image_info": info})

        pre = ShanghaiTechPreprocessor(height=40, width=60, sigma=3.0)
        db = pre.preprocess(str(raw))
        assert len(db) == 1
        assert db.head_counts[0] == 1.0
        np.testing.assert_allclose(db.density_maps[0].sum(), 1.0, rtol=1e-3)

    def test_empty_directory(self, tmp_path):
        db = UcfQnrfPreprocessor(height=32, width=32).preprocess(
            str(tmp_path))
        assert len(db) == 0

    def test_ucf_cc_50_layout(self, tmp_path):
        """UCF-CC-50: bare numeric names (1.jpg + 1_ann.mat['annPoints'])."""
        from srgan_tpu.data.crowd import UcfCc50Preprocessor
        raw = tmp_path / "raw"
        raw.mkdir()
        _write_image(raw / "1.jpg", h=40, w=60)
        savemat(raw / "1_ann.mat",
                {"annPoints": np.array([[10.0, 20.0], [50.0, 30.0]])})
        pre = UcfCc50Preprocessor(height=80, width=120, sigma=3.0)
        db = pre.preprocess(str(raw))
        assert len(db) == 1 and db.head_counts[0] == 2.0
        np.testing.assert_allclose(db.density_maps[0].sum(), 2.0, rtol=1e-3)
        # raw (x,y)=(10,20) → resized (y,x)=(40,20)
        assert db.density_maps[0][40, 20] > np.median(db.density_maps[0])

    def test_world_expo_layout(self, tmp_path):
        """WorldExpo'10: <name>.jpg + <name>.mat['point_position'];
        empty frames allowed."""
        from srgan_tpu.data.crowd import WorldExpoPreprocessor
        raw = tmp_path / "raw" / "scene_104207"
        raw.mkdir(parents=True)
        _write_image(raw / "104207_1.jpg", h=40, w=60)
        savemat(raw / "104207_1.mat",
                {"point_position": np.array([[30.0, 20.0]])})
        _write_image(raw / "104207_2.jpg", h=40, w=60)
        savemat(raw / "104207_2.mat",
                {"point_position": np.zeros((0, 2))})
        pre = WorldExpoPreprocessor(height=40, width=60, sigma=3.0)
        db = pre.preprocess(str(tmp_path / "raw"))
        assert len(db) == 2
        np.testing.assert_allclose(db.head_counts, [1.0, 0.0])
        np.testing.assert_allclose(db.density_maps[0].sum(), 1.0, rtol=1e-3)
        assert db.density_maps[1].sum() == 0.0

    def test_world_expo_roi_masks(self, tmp_path):
        """WorldExpo per-scene roi.mat (ROI polygon) → db.roi_masks;
        scenes without roi.mat get whole-image masks."""
        from srgan_tpu.data.crowd import WorldExpoPreprocessor
        raw = tmp_path / "raw" / "scene_1"
        raw.mkdir(parents=True)
        _write_image(raw / "1_1.jpg", h=40, w=60)
        savemat(raw / "1_1.mat",
                {"point_position": np.array([[10.0, 20.0]])})
        # ROI polygon: left half of the frame
        savemat(raw / "roi.mat",
                {"maskVerticesXCoordinates": np.array([[0.0], [29.0],
                                                       [29.0], [0.0]]),
                 "maskVerticesYCoordinates": np.array([[0.0], [0.0],
                                                       [39.0], [39.0]])})
        pre = WorldExpoPreprocessor(height=40, width=60, sigma=3.0)
        db = pre.preprocess(str(tmp_path / "raw"))
        assert db.roi_masks is not None
        assert db.roi_masks[0, 20, 5] == 1    # inside ROI
        assert db.roi_masks[0, 20, 50] == 0   # outside ROI

    def test_roi_ground_truth_masked_symmetrically(self):
        """Scoring masked predictions against UNmasked head counts would
        bias MAE upward by the out-of-ROI mass — the truth must follow
        the same ROI convention (review r3)."""
        import dataclasses
        db = synthetic_crowd_database(2, height=32, width=32, max_heads=20,
                                      sigma=2.0, seed=3)
        rois = np.zeros((2, 32, 32), np.uint8)
        rois[:, :, :16] = 1  # left half only
        masked = dataclasses.replace(db, roi_masks=rois)
        got = masked.roi_head_counts()
        want = (db.density_maps * rois).sum(axis=(1, 2))
        np.testing.assert_allclose(got, want, rtol=1e-6)
        assert (got < db.head_counts).all()  # out-of-ROI mass excluded
        # no masks → untouched head counts
        np.testing.assert_array_equal(db.roi_head_counts(),
                                      db.head_counts)

    def test_polygon_roi_mask_rasterization(self):
        from srgan_tpu.data.crowd import polygon_roi_mask
        m = polygon_roi_mask([0, 9, 9, 0], [0, 0, 9, 9], 20, 20)
        assert m[5, 5] == 1 and m[15, 15] == 0
        assert m.shape == (20, 20) and m.dtype == np.uint8

    def test_all_four_preprocessors_registered(self):
        from srgan_tpu.data.crowd import PREPROCESSORS
        assert set(PREPROCESSORS) == {"ucf_qnrf", "shanghai_tech",
                                      "ucf_cc_50", "world_expo"}


class TestCrowdExperiment:
    def _settings(self, tmp_path, **kw):
        base = dict(trial_name="crowdtest",
                    logs_directory=str(tmp_path / "logs"),
                    batch_size=8, steps_to_run=3, summary_step_period=2,
                    labeled_dataset_size=6, unlabeled_dataset_size=8,
                    validation_dataset_size=3,
                    crowd_image_height=80, crowd_image_width=96,
                    image_patch_size=32, crowd_sigma=3.0,
                    crowd_synthetic_max_heads=12,
                    model_base_width=8, latent_dimension=16,
                    learning_rate=1e-3, seed=0)
        base.update(kw)
        return Settings(**base)

    def test_end_to_end_short_trial(self, tmp_path):
        from srgan_tpu.apps.crowd import CrowdExperiment
        import jax

        exp = CrowdExperiment(self._settings(tmp_path))
        state = exp.train()
        assert int(jax.device_get(state.step)) == 3
        result = exp.evaluate()
        for name in ("MAE", "RMSE", "NVE", "NAE"):
            assert np.isfinite(result[name]), name
        # summaries written
        gan_scalars = os.path.join(exp.trial_directory, "GAN",
                                   "scalars.jsonl")
        assert os.path.exists(gan_scalars)

    def test_test_split_is_distinct_from_validation(self, tmp_path):
        """Regression (VERDICT r1 missing #3): crowd test MAE must be
        computed on the TEST images — evaluate() used to ignore its
        dataset argument and silently report validation metrics."""
        from srgan_tpu.apps.crowd import CrowdExperiment

        exp = CrowdExperiment(self._settings(tmp_path,
                                             test_dataset_size=4))
        exp.train()
        assert exp.test_db is not None and len(exp.test_db) == 4
        val = exp.evaluate()
        test = exp.test()
        assert np.isfinite(test["MAE"])
        assert test["MAE"] != val["MAE"]
        # evaluate(dataset=...) honors its argument
        again = exp.evaluate(dataset=exp.test_db)
        assert again["MAE"] == test["MAE"]

    def test_test_without_split_warns(self, tmp_path):
        from srgan_tpu.apps.crowd import CrowdExperiment

        exp = CrowdExperiment(self._settings(tmp_path))
        exp.train()
        exp.test_dataset = None  # database without test.npz
        with pytest.warns(UserWarning, match="VALIDATION"):
            result = exp.test()
        assert result["MAE"] == exp.evaluate()["MAE"]

    def test_sharded_sampler_matches_unsharded(self, tmp_path):
        """The shard_map sampler (mesh>1) must produce exactly the same
        patches as the plain path for the same (index, offset, flip)."""
        import jax
        from srgan_tpu.apps.crowd import CrowdExperiment

        exp = CrowdExperiment(self._settings(tmp_path, batch_size=8))
        exp.dataset_setup()
        models, d, g, dnn = exp.model_setup()
        from srgan_tpu.train import init_train_state
        exp.models = models
        exp.state = init_train_state(exp.settings, d, g, dnn)
        exp.prepare_mesh()        # 8 virtual devices → shard_map path
        assert exp.mesh.size == 8
        exp.prepare_train_step()

        rng = np.random.default_rng(0)
        data = exp._device_data
        idx, offs, flips, sidx = exp._random_patch_args(
            rng, len(exp.labeled_db), exp.labeled_db.image_size, 8)
        uidx, uoffs, uflips, usidx = exp._random_patch_args(
            rng, len(exp.unlabeled_db), exp.unlabeled_db.image_size, 8)
        sharded = exp._sample_batch(
            data["labeled_images"], data["labeled_density"],
            data["unlabeled_images"], idx, offs, flips, sidx,
            uidx, uoffs, uflips, usidx)

        # plain (single-device) reference via the ops API
        from srgan_tpu.ops.patches import extract_patches
        p = exp.settings.image_patch_size
        want = extract_patches(
            data["labeled_images"], offs, flips, patch_size=p,
            scale=2.0 / 255.0, shift=-1.0, indices=idx)
        np.testing.assert_allclose(np.asarray(sharded[0]),
                                   np.asarray(want), rtol=1e-6)

    def test_end_to_end_iknn_target(self, tmp_path):
        """crowd_label_type='iknn': the map head regresses the iKNN map,
        counts come from the count head; trains and evaluates end-to-end."""
        import jax
        from srgan_tpu.apps.crowd import CrowdExperiment

        exp = CrowdExperiment(self._settings(tmp_path,
                                             crowd_label_type="iknn"))
        state = exp.train()
        assert int(jax.device_get(state.step)) == 3
        assert exp.labeled_db.aux_maps is not None
        result = exp.evaluate()
        assert np.isfinite(result["MAE"])

    def test_end_to_end_host_pipeline(self, tmp_path):
        """Same trial through the native C++ input runtime."""
        import jax
        from srgan_tpu.apps.crowd import CrowdExperiment
        from srgan_tpu.io import native_library_available

        if not native_library_available():
            pytest.skip("g++ unavailable")
        exp = CrowdExperiment(self._settings(tmp_path,
                                             crowd_host_pipeline=True))
        # the measured tier-selection advisory is intended behavior
        with pytest.warns(UserWarning, match="crowd_host_pipeline"):
            state = exp.train()
        assert int(jax.device_get(state.step)) == 3
        result = exp.evaluate()
        assert np.isfinite(result["MAE"])

    def test_counts_converge(self, tmp_path):
        """Longer integration: training reduces full-image count MAE
        substantially vs the untrained model (CPU-scale steps are too few
        to beat the naive mean predictor — that bar belongs to TPU-scale
        runs). Gated behind SRGAN_SLOW_TESTS=1 (~5 min on CPU)."""
        if not os.environ.get("SRGAN_SLOW_TESTS"):
            pytest.skip("set SRGAN_SLOW_TESTS=1 to run")
        from srgan_tpu.apps.crowd import CrowdExperiment

        settings = self._settings(
            tmp_path, steps_to_run=400, batch_size=16,
            labeled_dataset_size=24, unlabeled_dataset_size=32,
            validation_dataset_size=8, learning_rate=3e-3,
            summary_step_period=100)
        # untrained baseline: same experiment, zero steps
        ref = CrowdExperiment(settings.copy(steps_to_run=0))
        ref.train()
        untrained = ref.evaluate(use_dnn=True)["MAE"]

        exp = CrowdExperiment(settings)
        exp.train()
        trained = exp.evaluate(use_dnn=True)["MAE"]
        # 400 CPU-scale steps only start differentiating per-image counts
        # (full convergence is demonstrated at TPU scale — 2500 steps
        # reach well under the naive-mean MAE); require clear directional
        # improvement here.
        assert trained < 0.95 * untrained, (trained, untrained)

    def test_end_to_end_random_rescale(self, tmp_path):
        """crowd_rescale_factors: the rescale-augmented sampler trains
        end-to-end and evaluates finitely (SURVEY §2 6c '+rescale')."""
        import jax
        from srgan_tpu.apps.crowd import CrowdExperiment

        exp = CrowdExperiment(self._settings(
            tmp_path, crowd_rescale_factors=(0.75, 1.0, 1.25)))
        state = exp.train()
        assert int(jax.device_get(state.step)) == 3
        assert np.isfinite(exp.evaluate()["MAE"])

    def test_rescale_windows_derived_from_patch_size(self, tmp_path):
        from srgan_tpu.apps.crowd import CrowdExperiment

        exp = CrowdExperiment(self._settings(
            tmp_path, crowd_rescale_factors=(0.5, 1.0, 1.5),
            image_patch_size=32))
        assert exp._rescale_windows == (16, 32, 48)

    def test_rescale_rejects_aux_label_types(self, tmp_path):
        """kNN/iKNN targets are not scale-covariant under resize — the
        combination must fail fast, not silently train on wrong labels."""
        from srgan_tpu.apps.crowd import CrowdExperiment
        from srgan_tpu.train import init_train_state

        exp = CrowdExperiment(self._settings(
            tmp_path, crowd_rescale_factors=(0.75, 1.25),
            crowd_label_type="iknn"))
        exp.dataset_setup()
        models, d, g, dnn = exp.model_setup()
        exp.models = models
        exp.state = init_train_state(exp.settings, d, g, dnn)
        exp.prepare_mesh()
        with pytest.raises(ValueError, match="scale-covariant"):
            exp.prepare_train_step()

    def test_rescale_oversized_factor_fails_fast(self, tmp_path):
        """A factor whose window exceeds the images must fail at
        prepare_train_step with guidance, not mid-epoch in the host
        sampler (review r3)."""
        from srgan_tpu.apps.crowd import CrowdExperiment
        from srgan_tpu.train import init_train_state

        exp = CrowdExperiment(self._settings(
            tmp_path, crowd_rescale_factors=(4.0,)))  # 128 > 80x96 images
        exp.dataset_setup()
        models, d, g, dnn = exp.model_setup()
        exp.models = models
        exp.state = init_train_state(exp.settings, d, g, dnn)
        exp.prepare_mesh()
        with pytest.raises(ValueError, match="smallest image dimension"):
            exp.prepare_train_step()

    def test_rescale_sampler_bounds_windows(self, tmp_path):
        """Offsets must keep each example's own window inside the image."""
        from srgan_tpu.apps.crowd import CrowdExperiment

        exp = CrowdExperiment(self._settings(
            tmp_path, crowd_rescale_factors=(0.75, 1.0, 1.5)))
        exp.dataset_setup()
        windows = np.asarray(exp._rescale_windows)
        rng = np.random.default_rng(0)
        h, w = exp.labeled_db.image_size
        for _ in range(10):
            idx, offs, flips, sidx = exp._random_patch_args(
                rng, len(exp.labeled_db), (h, w), 64)
            win = windows[sidx]
            assert (offs[:, 0] + win <= h).all()
            assert (offs[:, 1] + win <= w).all()
            assert (offs >= 0).all()

    def test_device_grid_eval_matches_host_golden_model(self, tmp_path):
        """The one-jit device-side grid evaluation (patch grid → forward
        → overlap-average canvas → Σ, shard_mapped over 'data') must
        reproduce the straightforward host reassembly exactly (VERDICT
        r2 next #3)."""
        import jax
        import jax.numpy as jnp
        from srgan_tpu.apps.crowd import (CrowdExperiment,
                                          DENSITY_DOWNSAMPLE)
        from srgan_tpu.ops.patches import extract_patches

        exp = CrowdExperiment(self._settings(tmp_path,
                                             validation_dataset_size=5))
        exp.train()
        got = exp.predict_image_counts(use_dnn=False)

        # Host golden model: per-patch forward + NumPy canvas assembly.
        p = exp.settings.image_patch_size
        f = DENSITY_DOWNSAMPLE
        db = exp.validation_db
        h, w = db.image_size
        offsets = exp._grid_offsets((h, w))
        params = exp.state.d_params
        want = np.zeros(len(db), np.float32)
        for i in range(len(db)):
            idx = np.full(len(offsets), i, np.int32)
            patches = extract_patches(
                jnp.asarray(db.images), jnp.asarray(offsets),
                jnp.zeros(len(offsets), jnp.int32), patch_size=p,
                scale=2.0 / 255.0, shift=-1.0, indices=jnp.asarray(idx))
            maps = np.asarray(
                exp.models.d_apply(params, patches)[0][0], np.float32)
            canvas = np.zeros((h // f, w // f), np.float32)
            weight = np.zeros((h // f, w // f), np.float32)
            for (oy, ox), dm in zip(offsets, maps):
                sy, sx = oy // f, ox // f
                canvas[sy:sy + p // f, sx:sx + p // f] += dm
                weight[sy:sy + p // f, sx:sx + p // f] += 1.0
            want[i] = (canvas / np.maximum(weight, 1.0)).sum()
        np.testing.assert_allclose(got, want, rtol=2e-4)

    def test_predict_density_maps_integrate_to_counts(self, tmp_path):
        """predict_density_maps exposes the overlap-averaged canvases;
        their integrals must equal predict_image_counts exactly."""
        from srgan_tpu.apps.crowd import (CrowdExperiment,
                                          DENSITY_DOWNSAMPLE)

        exp = CrowdExperiment(self._settings(tmp_path))
        exp.train()
        maps = exp.predict_density_maps(use_dnn=False)
        counts = exp.predict_image_counts(use_dnn=False)
        h, w = exp.validation_db.image_size
        f = DENSITY_DOWNSAMPLE
        assert maps.shape == (len(exp.validation_db), h // f, w // f)
        np.testing.assert_allclose(maps.sum(axis=(1, 2)), counts,
                                   rtol=1e-4)

    def test_roi_masked_eval_matches_golden_model(self, tmp_path):
        """WorldExpo-convention evaluation: predicted density counted
        only inside the (fractional, density-resolution) ROI."""
        import dataclasses
        import jax
        from srgan_tpu.apps.crowd import (CrowdExperiment,
                                          DENSITY_DOWNSAMPLE)

        exp = CrowdExperiment(self._settings(tmp_path,
                                             validation_dataset_size=3))
        exp.train()
        db = exp.validation_db
        h, w = db.image_size
        f = DENSITY_DOWNSAMPLE
        rng = np.random.default_rng(0)
        rois = (rng.uniform(size=(len(db), h, w)) < 0.5).astype(np.uint8)
        masked_db = dataclasses.replace(db, roi_masks=rois)
        unmasked = exp.predict_image_counts(use_dnn=False, db=db)
        masked = exp.predict_image_counts(use_dnn=False, db=masked_db)
        assert not np.allclose(masked, unmasked)  # the mask is applied

        # Golden model: host canvas reassembly with the fractional
        # density-resolution ROI coverage applied before summation.
        import jax.numpy as jnp
        from srgan_tpu.ops.patches import extract_patches
        p = exp.settings.image_patch_size
        offsets = exp._grid_offsets((h, w))
        mask_ds = rois.reshape(len(db), h // f, f, w // f, f).mean(
            axis=(2, 4)).astype(np.float32)
        want = np.zeros(len(db), np.float32)
        for i in range(len(db)):
            patches = extract_patches(
                jnp.asarray(db.images), jnp.asarray(offsets),
                jnp.zeros(len(offsets), jnp.int32), patch_size=p,
                scale=2.0 / 255.0, shift=-1.0,
                indices=jnp.full(len(offsets), i, jnp.int32))
            maps = np.asarray(
                exp.models.d_apply(exp.state.d_params, patches)[0][0],
                np.float32)
            canvas = np.zeros((h // f, w // f), np.float32)
            weight = np.zeros((h // f, w // f), np.float32)
            for (oy, ox), dm in zip(offsets, maps):
                sy, sx = oy // f, ox // f
                canvas[sy:sy + p // f, sx:sx + p // f] += dm
                weight[sy:sy + p // f, sx:sx + p // f] += 1.0
            want[i] = ((canvas / np.maximum(weight, 1.0))
                       * mask_ds[i]).sum()
        np.testing.assert_allclose(masked, want, rtol=2e-4)

        # Full-coverage mask path is exact vs the unmasked path.
        ones_db = dataclasses.replace(
            db, roi_masks=np.ones((len(db), h, w), np.uint8))
        with_ones = exp.predict_image_counts(use_dnn=False, db=ones_db)
        np.testing.assert_allclose(with_ones, unmasked, rtol=1e-5)

    def test_roi_masks_save_load_roundtrip(self, tmp_path):
        import dataclasses
        db = synthetic_crowd_database(2, height=32, width=32, seed=0)
        rois = np.zeros((2, 32, 32), np.uint8)
        rois[:, :16] = 1
        db = dataclasses.replace(db, roi_masks=rois)
        path = str(tmp_path / "roi.npz")
        db.save(path)
        loaded = CrowdDatabase.load(path)
        np.testing.assert_array_equal(loaded.roi_masks, rois)

    def test_dnn_only_skips_untrained_d_grid_eval(self, tmp_path):
        """Regression (VERDICT r2 weak #1): a crowd --dnn_only trial must
        not grid-evaluate the untrained discriminator init every
        validation pass and log the garbage as GAN validation/MAE — only
        the DNN writer gets validation scalars."""
        import json
        from srgan_tpu.apps.crowd import CrowdExperiment

        exp = CrowdExperiment(self._settings(tmp_path, dnn_only=True,
                                             steps_to_run=2))
        exp.train()

        def scalar_tags(writer_dir):
            path = os.path.join(exp.trial_directory, writer_dir,
                                "scalars.jsonl")
            if not os.path.exists(path):
                return set()
            with open(path) as f:
                return {json.loads(line)["tag"] for line in f if line.strip()}

        assert "validation/MAE" in scalar_tags("DNN")
        assert "validation/MAE" not in scalar_tags("GAN")

    def test_evaluate_empty_database_refuses(self, tmp_path):
        """Regression (VERDICT r2 weak #6): crowd evaluate() must raise on
        a len-0 split instead of computing NaN metrics."""
        from srgan_tpu.apps.crowd import CrowdExperiment

        exp = CrowdExperiment(self._settings(tmp_path))
        exp.train()
        empty = synthetic_crowd_database(0, height=80, width=96)
        with pytest.raises(ValueError, match="empty"):
            exp.evaluate(dataset=empty)

    def test_labeled_loss_two_heads(self):
        import jax.numpy as jnp
        from srgan_tpu.apps.crowd import CrowdExperiment, sum_pool

        exp = CrowdExperiment(Settings(image_patch_size=8))
        loss_fn = exp.labeled_loss_fn()
        labels = jnp.ones((2, 8, 8)) * 0.25   # 16 mass per 4x4 target cell
        target = sum_pool(labels, 4)          # [2, 2, 2] of 4.0
        perfect = (target, target)            # count map summing to 16
        assert float(loss_fn(perfect, labels)) == pytest.approx(0.0,
                                                                abs=1e-5)
        off = (target + 1.0, target)
        assert float(loss_fn(off, labels)) > 0.0


class TestShardedDataset:
    """crowd_shard_dataset: the HBM-resident database sharded over 'data'
    (VERDICT r1 next-step #8) — per-device shards differ, sampling uses
    local indices, and training runs end-to-end."""

    def _settings(self, tmp_path, **kw):
        base = dict(trial_name="sharddb",
                    logs_directory=str(tmp_path / "logs"),
                    batch_size=8, steps_to_run=3, summary_step_period=2,
                    labeled_dataset_size=16, unlabeled_dataset_size=16,
                    validation_dataset_size=3,
                    crowd_image_height=64, crowd_image_width=64,
                    image_patch_size=32, crowd_sigma=3.0,
                    model_base_width=8, latent_dimension=16, seed=0,
                    crowd_shard_dataset=True)
        base.update(kw)
        return Settings(**base)

    def test_local_index_semantics(self, tmp_path):
        """Local index 0 on device d must address global example
        d * n_local: the sampler must NOT see a replicated database."""
        import jax
        from srgan_tpu.apps.crowd import CrowdExperiment
        from srgan_tpu.train import init_train_state

        exp = CrowdExperiment(self._settings(tmp_path))
        exp.dataset_setup()
        models, d, g, dnn = exp.model_setup()
        exp.models = models
        exp.state = init_train_state(exp.settings, d, g, dnn)
        exp.prepare_mesh()
        assert exp.mesh.size == 8
        exp.prepare_train_step()
        n_local = exp._labeled_index_bound
        assert n_local == 2  # 16 examples / 8 devices

        data = exp._device_data
        # each device's shard must be a distinct slice, not a replica
        shards = data["labeled_images"].addressable_shards
        assert len(shards) == 8
        assert not np.array_equal(np.asarray(shards[0].data),
                                  np.asarray(shards[1].data))

        p = exp.settings.image_patch_size
        batch = exp.settings.batch_size
        zeros = np.zeros(batch, np.int32)
        offs = np.zeros((batch, 2), np.int32)
        patches, _, _ = exp._sample_batch(
            data["labeled_images"], data["labeled_density"],
            data["unlabeled_images"], zeros, offs, zeros, zeros,
            zeros, offs, zeros, zeros)
        patches = np.asarray(jax.device_get(patches))
        for dev in range(8):
            want = (exp.labeled_db.images[dev * n_local, :p, :p]
                    .astype(np.float32) * (2.0 / 255.0) - 1.0)
            np.testing.assert_allclose(patches[dev], want, atol=1e-6,
                                       err_msg=f"device {dev}")

    def test_trains_end_to_end(self, tmp_path):
        import jax
        from srgan_tpu.apps.crowd import CrowdExperiment

        exp = CrowdExperiment(self._settings(tmp_path))
        state = exp.train()
        assert int(jax.device_get(state.step)) == 3
        assert np.isfinite(exp.evaluate()["MAE"])

    def test_pads_non_divisible_split(self, tmp_path):
        """15 examples over 8 devices: cyclic padding to 16, bound 2."""
        import jax
        from srgan_tpu.apps.crowd import CrowdExperiment

        exp = CrowdExperiment(self._settings(
            tmp_path, labeled_dataset_size=15, unlabeled_dataset_size=9))
        state = exp.train()
        assert exp._labeled_index_bound == 2
        assert exp._unlabeled_index_bound == 2
        assert int(jax.device_get(state.step)) == 3

    def test_shard_local_counts(self):
        from srgan_tpu.apps.crowd import shard_local_counts
        # 15/8: shards 0..6 hold 2 true rows, shard 7 holds 1 + 1 pad
        np.testing.assert_array_equal(shard_local_counts(15, 8),
                                      [2, 2, 2, 2, 2, 2, 2, 1])
        # 9/8: per=2; shards 0..3 full, shard 4 has 1, shards 5..7 all pad
        np.testing.assert_array_equal(shard_local_counts(9, 8),
                                      [2, 2, 2, 2, 1, 1, 1, 1])
        np.testing.assert_array_equal(shard_local_counts(16, 8), [2] * 8)

    def test_non_divisible_split_never_samples_pad_duplicates(self,
                                                              tmp_path):
        """Regression (ADVICE r2): with 15 examples over 8 devices the
        last shard's padded row (a duplicate of example 0) must never be
        sampled — example 0 would be drawn ~2× as often as the rest."""
        import jax
        from srgan_tpu.apps.crowd import CrowdExperiment
        from srgan_tpu.parallel import mesh as pmesh
        from srgan_tpu.train import init_train_state

        exp = CrowdExperiment(self._settings(
            tmp_path, labeled_dataset_size=15, unlabeled_dataset_size=15,
            crowd_image_height=64, crowd_image_width=64))
        exp.dataset_setup()
        models, d, g, dnn = exp.model_setup()
        exp.models = models
        exp.state = init_train_state(exp.settings, d, g, dnn)
        exp.prepare_mesh()
        exp.prepare_train_step()
        # Patterned database: example i is the constant value i.
        n = len(exp.labeled_db)
        patterned = np.broadcast_to(
            np.arange(n, dtype=np.uint8)[:, None, None, None],
            exp.labeled_db.images.shape).copy()
        data = dict(exp._device_data)
        data["labeled_images"] = jax.device_put(
            np.resize(patterned, (16,) + patterned.shape[1:]),
            pmesh.batch_sharding(exp.mesh))

        rng = np.random.default_rng(0)
        share = exp.settings.batch_size // exp.mesh.size
        n_lab = np.repeat(exp._labeled_local_counts, share)
        hw = exp.labeled_db.image_size
        last_shard_vals = set()
        for _ in range(30):
            idx, offs, flips, sidx = exp._random_patch_args(rng, n_lab,
                                                            hw, 8)
            patches, _, _ = exp._sample_batch(
                data["labeled_images"], data["labeled_density"],
                data["unlabeled_images"], idx, offs, flips, sidx,
                idx, offs, flips, sidx)
            vals = np.asarray(jax.device_get(patches))[:, 0, 0, 0]
            ids = [int(round((v + 1.0) * 255.0 / 2.0)) for v in vals]
            last_shard_vals.update(ids[-share:])
        # shard 7 holds true example 14 plus a pad duplicate of example 0;
        # only the true example may ever be sampled there
        assert last_shard_vals == {14}


class TestCrowdModelVariants:
    """The reference's deeper crowd architectures (crowd/models.py
    JointDCNN / spatial-pyramid heads, SURVEY.md §2 5c [L])."""

    @pytest.mark.parametrize("name", ["jointcnn", "jointdcnn", "pyramid"])
    def test_forward_contract(self, name):
        import jax
        import jax.numpy as jnp
        from srgan_tpu.models.crowd import CROWD_MODELS

        model = CROWD_MODELS[name](base_width=8)
        x = jnp.zeros((2, 32, 32, 3), jnp.float32)
        params = model.init(jax.random.key(0), x)
        (density, count), features = model.apply(params, x)
        assert density.shape == (2, 8, 8)   # 1/4 input resolution
        assert count.shape == (2, 8, 8)
        assert features.ndim == 2 and features.shape[0] == 2
        assert np.isfinite(np.asarray(density)).all()

    @pytest.mark.parametrize("name", ["jointdcnn", "pyramid"])
    def test_trains_end_to_end(self, name, tmp_path):
        import jax
        from srgan_tpu.apps.crowd import CrowdExperiment

        settings = Settings(
            trial_name=f"variant_{name}",
            logs_directory=str(tmp_path / "logs"),
            batch_size=8, steps_to_run=2, summary_step_period=2,
            labeled_dataset_size=6, unlabeled_dataset_size=8,
            validation_dataset_size=2, crowd_image_height=64,
            crowd_image_width=64, image_patch_size=32, crowd_sigma=3.0,
            model_base_width=8, latent_dimension=16,
            crowd_model=name)
        exp = CrowdExperiment(settings)
        state = exp.train()
        assert int(jax.device_get(state.step)) == 2
        assert np.isfinite(exp.evaluate()["MAE"])

    def test_unknown_variant_raises(self, tmp_path):
        from srgan_tpu.apps.crowd import CrowdExperiment

        settings = Settings(
            trial_name="bad", logs_directory=str(tmp_path / "logs"),
            crowd_model="resnet")
        exp = CrowdExperiment(settings)
        with pytest.raises(ValueError, match="crowd_model"):
            exp.model_setup()


def test_dnn_use_norm_asymmetric_baseline(tmp_path):
    """Settings.dnn_use_norm=False: normed adversarial D + no-norm DNN
    (measured-better baseline, docs/design.md §7) train side by side."""
    import jax
    from srgan_tpu.apps.crowd import CrowdExperiment

    settings = Settings(
        trial_name="asym", logs_directory=str(tmp_path / "logs"),
        batch_size=8, steps_to_run=2, summary_step_period=2,
        labeled_dataset_size=6, unlabeled_dataset_size=8,
        validation_dataset_size=2, crowd_image_height=64,
        crowd_image_width=64, image_patch_size=32, crowd_sigma=3.0,
        model_base_width=8, latent_dimension=16, dnn_use_norm=False)
    exp = CrowdExperiment(settings)
    state = exp.train()
    assert int(jax.device_get(state.step)) == 2
    # the DNN tree really lost its norm params; the D kept them
    d_keys = str(jax.tree_util.tree_structure(state.d_params))
    dnn_keys = str(jax.tree_util.tree_structure(state.dnn_params))
    assert "GroupNorm" in d_keys
    assert "GroupNorm" not in dnn_keys
    assert np.isfinite(exp.evaluate(use_dnn=True)["MAE"])


def test_sharded_sampling_covers_all_examples(tmp_path):
    """Over many steps, the sharded sampler must reach every example of
    every device's shard — stratified-uniform sampling over the global
    dataset, not a frozen subset (VERDICT r1 item 8: 'training still
    matches the replicated path statistically')."""
    import jax
    from srgan_tpu.apps.crowd import CrowdExperiment
    from srgan_tpu.train import init_train_state

    settings = Settings(
        trial_name="cover", logs_directory=str(tmp_path / "logs"),
        batch_size=8, labeled_dataset_size=16, unlabeled_dataset_size=16,
        validation_dataset_size=2, crowd_image_height=64,
        crowd_image_width=64, image_patch_size=32, crowd_sigma=3.0,
        model_base_width=8, latent_dimension=16, seed=0,
        crowd_shard_dataset=True)
    exp = CrowdExperiment(settings)
    exp.dataset_setup()
    models, d, g, dnn = exp.model_setup()
    exp.models = models
    exp.state = init_train_state(exp.settings, d, g, dnn)
    exp.prepare_mesh()
    exp.prepare_train_step()

    # Patterned database: example i is the constant value i → a sampled
    # patch identifies its source example exactly.
    import jax.numpy as jnp
    from srgan_tpu.parallel import mesh as pmesh
    n = len(exp.labeled_db)
    patterned = np.broadcast_to(
        np.arange(n, dtype=np.uint8)[:, None, None, None],
        exp.labeled_db.images.shape).copy()
    data = dict(exp._device_data)
    data["labeled_images"] = jax.device_put(
        patterned, pmesh.batch_sharding(exp.mesh))

    rng = np.random.default_rng(0)
    seen = set()
    hw = exp.labeled_db.image_size
    for _ in range(40):
        idx, offs, flips, sidx = exp._random_patch_args(
            rng, exp._labeled_index_bound, hw, 8)
        patches, _, _ = exp._sample_batch(
            data["labeled_images"], data["labeled_density"],
            data["unlabeled_images"], idx, offs, flips, sidx,
            idx, offs, flips, sidx)
        vals = np.asarray(jax.device_get(patches))[:, 0, 0, 0]
        # invert the kernel's u8 normalization: v*2/255 - 1 → example id
        seen.update(int(round((v + 1.0) * 255.0 / 2.0)) for v in vals)
    assert seen == set(range(n)), f"unreached examples: {set(range(n)) - seen}"


def test_sharded_dataset_resume_roundtrip(tmp_path):
    """Checkpoint + resume with the database sharded over 'data': state
    restores into the sharded-pipeline trial and training continues."""
    import jax
    from srgan_tpu.apps.crowd import CrowdExperiment

    base = dict(
        trial_name="shardresume", logs_directory=str(tmp_path / "logs"),
        batch_size=8, labeled_dataset_size=16, unlabeled_dataset_size=16,
        validation_dataset_size=2, crowd_image_height=64,
        crowd_image_width=64, image_patch_size=32, crowd_sigma=3.0,
        model_base_width=8, latent_dimension=16, seed=0,
        crowd_shard_dataset=True)
    first = CrowdExperiment(Settings(steps_to_run=2,
                                     summary_step_period=2, **base))
    first.train()
    resumed = CrowdExperiment(Settings(
        steps_to_run=5, summary_step_period=2,
        load_model_path=first.trial_directory, **base))
    state = resumed.train()
    assert int(jax.device_get(state.step)) == 5
    assert np.isfinite(resumed.evaluate()["MAE"])


def test_hbm_budget_warning(monkeypatch, tmp_path):
    """Near-capacity databases produce actionable guidance, not a later
    opaque device OOM."""
    import jax
    from srgan_tpu.apps.crowd import CrowdExperiment
    from srgan_tpu.train import init_train_state

    exp = CrowdExperiment(Settings(
        trial_name="hbm", logs_directory=str(tmp_path / "logs"),
        batch_size=8, labeled_dataset_size=6, unlabeled_dataset_size=8,
        validation_dataset_size=2, crowd_image_height=64,
        crowd_image_width=64, image_patch_size=32, crowd_sigma=3.0,
        model_base_width=8, latent_dimension=16))
    exp.dataset_setup()
    models, d, g, dnn = exp.model_setup()
    exp.models = models
    exp.state = init_train_state(exp.settings, d, g, dnn)
    exp.prepare_mesh()

    class FakeDevice:
        def memory_stats(self):
            return {"bytes_limit": 1}  # tiny budget → must warn

    monkeypatch.setattr(jax, "devices", lambda *a: [FakeDevice()])
    with pytest.warns(UserWarning, match="crowd_shard_dataset"):
        exp._check_hbm_budget()


def test_hbm_budget_warning_no_memory_stats(monkeypatch, tmp_path):
    """When the backend reports no memory_stats (the axon remote-TPU
    tunnel — CLAUDE.md), the budget check falls back to the static
    Settings.device_hbm_gb capacity instead of silently returning: the
    pre-OOM guidance must fire on exactly the hardware where a multi-GB
    database would hit it (VERDICT r4 weak #2)."""
    import jax
    from srgan_tpu.apps.crowd import CrowdExperiment
    from srgan_tpu.train import init_train_state

    exp = CrowdExperiment(Settings(
        trial_name="hbm_none", logs_directory=str(tmp_path / "logs"),
        batch_size=8, labeled_dataset_size=6, unlabeled_dataset_size=8,
        validation_dataset_size=2, crowd_image_height=64,
        crowd_image_width=64, image_patch_size=32, crowd_sigma=3.0,
        model_base_width=8, latent_dimension=16,
        device_hbm_gb=1e-6))  # tiny assumed capacity → must warn
    exp.dataset_setup()
    models, d, g, dnn = exp.model_setup()
    exp.models = models
    exp.state = init_train_state(exp.settings, d, g, dnn)
    exp.prepare_mesh()

    class NoStatsDevice:
        def memory_stats(self):
            return None  # what the axon tunnel reports

    monkeypatch.setattr(jax, "devices", lambda *a: [NoStatsDevice()])
    with pytest.warns(UserWarning, match="assumed capacity"):
        exp._check_hbm_budget()


def test_full_chain_preprocess_cli_to_training(tmp_path):
    """The real-data user path end to end: raw annotation directory →
    preprocess CLI → {labeled,unlabeled,validation,test}.npz database →
    CrowdExperiment(crowd_database_path=...) training → held-out test —
    the exact chain a reference user runs with UCF-QNRF."""
    import jax
    from srgan_tpu.data.crowd import main as preprocess_main
    from srgan_tpu.apps.crowd import CrowdExperiment

    rng = np.random.default_rng(0)
    db_dir = tmp_path / "db"
    db_dir.mkdir()
    for split, n in (("labeled", 4), ("unlabeled", 4),
                     ("validation", 2), ("test", 2)):
        raw = tmp_path / f"raw_{split}"
        raw.mkdir()
        for i in range(n):
            _write_image(raw / f"img_{i:04d}.jpg", h=48, w=48)
            heads = rng.uniform(5, 40, size=(int(rng.integers(1, 6)), 2))
            savemat(raw / f"img_{i:04d}_ann.mat", {"annPoints": heads})
        rc = preprocess_main([str(raw), str(db_dir / f"{split}.npz"),
                              "--database", "ucf_qnrf", "--height", "64",
                              "--width", "64", "--sigma", "3.0"])
        assert rc == 0

    settings = Settings(
        trial_name="fullchain", logs_directory=str(tmp_path / "logs"),
        batch_size=8, steps_to_run=2, summary_step_period=2,
        crowd_database_path=str(db_dir), image_patch_size=32,
        model_base_width=8, latent_dimension=16, seed=0)
    exp = CrowdExperiment(settings)
    state = exp.train()
    assert int(jax.device_get(state.step)) == 2
    assert len(exp.labeled_db) == 4 and len(exp.test_db) == 2
    val = exp.evaluate()
    test = exp.test()
    assert np.isfinite(val["MAE"]) and np.isfinite(test["MAE"])
    assert test["MAE"] != val["MAE"]  # genuinely distinct split


def test_preprocess_cli_no_compress(tmp_path):
    """--no-compress writes a plain (uncompressed) npz that loads
    identically: multi-GB tiles databases skip single-core zlib at save
    and a full decompress at every training startup (round-5 CLI-scale
    rehearsal finding)."""
    import zipfile

    from srgan_tpu.data.crowd import CrowdDatabase
    from srgan_tpu.data.crowd import main as preprocess_main

    rng = np.random.default_rng(0)
    raw = tmp_path / "raw"
    raw.mkdir()
    for i in range(2):
        _write_image(raw / f"img_{i:04d}.jpg", h=48, w=48)
        heads = rng.uniform(5, 40, size=(3, 2))
        savemat(raw / f"img_{i:04d}_ann.mat", {"annPoints": heads})
    plain = tmp_path / "plain.npz"
    packed = tmp_path / "packed.npz"
    for out, extra in ((plain, ["--no-compress"]), (packed, [])):
        rc = preprocess_main([str(raw), str(out), "--height", "64",
                              "--width", "64", "--sigma", "3.0"] + extra)
        assert rc == 0
    with zipfile.ZipFile(plain) as z:
        assert all(i.compress_type == zipfile.ZIP_STORED
                   for i in z.infolist())
    with zipfile.ZipFile(packed) as z:
        assert any(i.compress_type == zipfile.ZIP_DEFLATED
                   for i in z.infolist())
    a, b = CrowdDatabase.load(str(plain)), CrowdDatabase.load(str(packed))
    np.testing.assert_array_equal(a.images, b.images)
    np.testing.assert_array_equal(a.density_maps, b.density_maps)


def test_full_chain_tiled_database_training(tmp_path):
    """Native-resolution user path: raw dir → preprocess --mode tiles →
    database with image_ids → training → per-SOURCE-image evaluation
    (tile counts aggregated before MAE, SURVEY.md §3.3/§3.5)."""
    import jax
    from srgan_tpu.data.crowd import main as preprocess_main
    from srgan_tpu.apps.crowd import CrowdExperiment

    rng = np.random.default_rng(0)
    db_dir = tmp_path / "db"
    db_dir.mkdir()
    for split, n in (("labeled", 2), ("unlabeled", 2),
                     ("validation", 2), ("test", 1)):
        raw = tmp_path / f"raw_{split}"
        raw.mkdir()
        for i in range(n):
            # native 96x128 images → 2x2 grid of 48x64 tiles each
            _write_image(raw / f"img_{i:04d}.jpg", h=96, w=128)
            heads = rng.uniform(5, 90, size=(int(rng.integers(2, 8)), 2))
            savemat(raw / f"img_{i:04d}_ann.mat", {"annPoints": heads})
        rc = preprocess_main([str(raw), str(db_dir / f"{split}.npz"),
                              "--database", "ucf_qnrf", "--height", "48",
                              "--width", "64", "--sigma", "3.0",
                              "--mode", "tiles"])
        assert rc == 0

    settings = Settings(
        trial_name="tiledchain", logs_directory=str(tmp_path / "logs"),
        batch_size=8, steps_to_run=2, summary_step_period=2,
        crowd_database_path=str(db_dir), image_patch_size=32,
        model_base_width=8, latent_dimension=16, seed=0)
    exp = CrowdExperiment(settings)
    state = exp.train()
    assert int(jax.device_get(state.step)) == 2
    assert len(exp.labeled_db) == 8  # 2 images x 4 tiles
    assert exp.labeled_db.num_source_images == 2
    val = exp.evaluate()
    assert np.isfinite(val["MAE"])
    # per-image truth: aggregated tile masses reproduce the head counts
    per_image = exp.validation_db.per_image_counts(
        exp.validation_db.head_counts)
    assert per_image.shape == (2,)
    np.testing.assert_allclose(per_image, np.round(per_image), atol=1e-3)
    test = exp.test()
    assert np.isfinite(test["MAE"])


def test_crowd_prepare_for_evaluation_restores(tmp_path):
    """evaluate_only flow on crowd: a fresh experiment restores the saved
    trial and grid-evaluates to the same numbers (the reference's
    load-then-evaluate mode, through the crowd patch-grid path)."""
    import jax
    from srgan_tpu.apps.crowd import CrowdExperiment

    base = dict(
        trial_name="evalonly", logs_directory=str(tmp_path / "logs"),
        batch_size=8, steps_to_run=3, summary_step_period=2,
        labeled_dataset_size=6, unlabeled_dataset_size=8,
        validation_dataset_size=3, crowd_image_height=64,
        crowd_image_width=64, image_patch_size=32, crowd_sigma=3.0,
        model_base_width=8, latent_dimension=16, seed=0)
    trained = CrowdExperiment(Settings(**base))
    trained.train()
    want = trained.evaluate()

    fresh = CrowdExperiment(Settings(**base))
    state = fresh.prepare_for_evaluation(trained.trial_directory)
    assert int(jax.device_get(state.step)) == 3
    got = fresh.evaluate()
    assert got["MAE"] == pytest.approx(want["MAE"], rel=1e-5)


def test_grid_eval_rejects_images_smaller_than_patch(tmp_path):
    """Images smaller than the patch must fail with an actionable error
    on the evaluate_only path, not emit NEGATIVE grid offsets that reach
    the Pallas gather as out-of-bounds DMA bases (VERDICT r3 weak #4).
    Training never reaches this (the patch sampler raises first), but
    prepare_for_evaluation → evaluate does."""
    from srgan_tpu.apps.crowd import CrowdExperiment

    settings = Settings(
        trial_name="tiny_eval", logs_directory=str(tmp_path / "logs"),
        batch_size=4, labeled_dataset_size=4, unlabeled_dataset_size=4,
        validation_dataset_size=2, crowd_image_height=24,
        crowd_image_width=24, image_patch_size=32, crowd_sigma=3.0,
        model_base_width=8, latent_dimension=8)
    exp = CrowdExperiment(settings)
    exp.dataset_setup()
    models, d_params, g_params, dnn_params = exp.model_setup()
    from srgan_tpu.train import init_train_state
    exp.models = models
    exp.state = init_train_state(settings, d_params, g_params, dnn_params)
    exp.prepare_mesh()
    with pytest.raises(ValueError, match="image_patch_size"):
        exp.evaluate()


class TestLabelDtype:
    """Settings.crowd_label_dtype: bf16 HBM label maps (capacity lever —
    the f32 density maps are the largest per-pixel HBM term; bf16 halves
    them while the Pallas patch kernel upcasts to f32 on extraction)."""

    def _settings(self, tmp_path, **kw):
        base = dict(trial_name="labeldtype",
                    logs_directory=str(tmp_path / "logs"),
                    batch_size=8, steps_to_run=3, summary_step_period=2,
                    labeled_dataset_size=6, unlabeled_dataset_size=8,
                    validation_dataset_size=3,
                    crowd_image_height=80, crowd_image_width=96,
                    image_patch_size=32, crowd_sigma=3.0,
                    crowd_synthetic_max_heads=12,
                    model_base_width=8, latent_dimension=16,
                    learning_rate=1e-3, seed=0)
        base.update(kw)
        return Settings(**base)

    def test_bf16_upload_trains_end_to_end(self, tmp_path):
        import jax
        import jax.numpy as jnp
        from srgan_tpu.apps.crowd import CrowdExperiment

        exp = CrowdExperiment(self._settings(
            tmp_path, crowd_label_dtype="bfloat16"))
        state = exp.train()
        assert exp._device_data["labeled_density"].dtype == jnp.bfloat16
        assert int(jax.device_get(state.step)) == 3
        result = exp.evaluate()
        for name in ("MAE", "RMSE", "NVE", "NAE"):
            assert np.isfinite(result[name]), name

    def test_bf16_patch_mass_within_tenth_percent(self):
        """The per-element bf16 rounding (~0.4% relative, unbiased) must
        cancel in the patch integrals the count targets are built from."""
        import jax.numpy as jnp
        from srgan_tpu.ops.patches import extract_patches

        rng = np.random.default_rng(3)
        # density-like magnitudes: Gaussian-kernel peaks are O(1e-2)
        dens = (rng.random((4, 80, 96, 1), np.float32) * 2e-2)
        offs = np.stack([rng.integers(0, 80 - 32, 8),
                         rng.integers(0, 96 - 32, 8)], axis=1)
        idx = rng.integers(0, 4, 8).astype(np.int32)
        flips = np.zeros(8, np.int32)
        f32 = extract_patches(jnp.asarray(dens), jnp.asarray(offs),
                              jnp.asarray(flips), patch_size=32,
                              indices=jnp.asarray(idx))
        bf16 = extract_patches(jnp.asarray(dens).astype(jnp.bfloat16),
                               jnp.asarray(offs), jnp.asarray(flips),
                               patch_size=32, indices=jnp.asarray(idx))
        assert f32.dtype == jnp.float32 and bf16.dtype == jnp.float32
        mass_f32 = np.asarray(f32).sum(axis=(1, 2, 3))
        mass_bf16 = np.asarray(bf16).sum(axis=(1, 2, 3))
        np.testing.assert_allclose(mass_bf16, mass_f32, rtol=1e-3)

    def test_bf16_rescaled_patch_mass(self):
        """bf16 labels compose with the random-rescale sampler: mass
        renorm happens f32-side after the kernel upcast, so the patch
        integrals stay within the bf16 rounding budget."""
        import jax.numpy as jnp
        from srgan_tpu.ops.patches import extract_rescaled_patches

        rng = np.random.default_rng(7)
        dens = (rng.random((3, 96, 96, 1), np.float32) * 2e-2)
        windows = (24, 32, 48)
        offs = np.stack([rng.integers(0, 96 - 48, 8),
                         rng.integers(0, 96 - 48, 8)], axis=1)
        sidx = rng.integers(0, 3, 8).astype(np.int32)
        idx = rng.integers(0, 3, 8).astype(np.int32)
        flips = (np.arange(8) % 2).astype(np.int32)
        kw = dict(patch_size=32, window_sizes=windows,
                  preserve_mass=True)
        f32 = extract_rescaled_patches(
            jnp.asarray(dens), jnp.asarray(offs), jnp.asarray(flips),
            jnp.asarray(sidx), indices=jnp.asarray(idx), **kw)
        bf16 = extract_rescaled_patches(
            jnp.asarray(dens).astype(jnp.bfloat16), jnp.asarray(offs),
            jnp.asarray(flips), jnp.asarray(sidx),
            indices=jnp.asarray(idx), **kw)
        np.testing.assert_allclose(
            np.asarray(bf16).sum(axis=(1, 2, 3)),
            np.asarray(f32).sum(axis=(1, 2, 3)), rtol=1e-3)

    def test_host_pipeline_streams_bf16_labels(self, tmp_path):
        """The host tier now streams label crops at crowd_label_dtype
        (bf16 halves the label transfer; VERDICT r3 #3 'keep label
        crops bf16-able') — a full trial trains and evaluates finitely."""
        import jax
        from srgan_tpu.apps.crowd import CrowdExperiment
        from srgan_tpu.io import native_library_available

        if not native_library_available():
            pytest.skip("g++ unavailable")
        exp = CrowdExperiment(self._settings(
            tmp_path, crowd_host_pipeline=True,
            crowd_label_dtype="bfloat16"))
        with pytest.warns(UserWarning, match="crowd_host_pipeline"):
            state = exp.train()
        assert int(jax.device_get(state.step)) == 3
        assert np.isfinite(exp.evaluate()["MAE"])

    def test_unknown_label_dtype_rejected(self, tmp_path):
        from srgan_tpu.apps.crowd import CrowdExperiment

        exp = CrowdExperiment(self._settings(
            tmp_path, crowd_label_dtype="float16"))
        with pytest.raises(ValueError, match="crowd_label_dtype"):
            exp._label_dtype

    def test_bf16_with_sharded_dataset(self, tmp_path):
        """bf16 labels compose with crowd_shard_dataset: the cyclic pad
        (np.resize on an ml_dtypes array) and the shard_map sampler must
        handle the 2-byte dtype end-to-end."""
        import jax
        import jax.numpy as jnp
        from srgan_tpu.apps.crowd import CrowdExperiment

        # 13 examples / 8 devices: NON-divisible, so the cyclic pad
        # actually wraps (np.resize duplicates examples 0-2 in bf16).
        exp = CrowdExperiment(self._settings(
            tmp_path, labeled_dataset_size=13, unlabeled_dataset_size=13,
            crowd_image_height=64, crowd_image_width=64,
            crowd_shard_dataset=True, crowd_label_dtype="bfloat16"))
        state = exp.train()
        dens = exp._device_data["labeled_density"]
        assert dens.dtype == jnp.bfloat16
        assert len(dens.addressable_shards) == 8
        assert int(jax.device_get(state.step)) == 3
        assert np.isfinite(exp.evaluate()["MAE"])


class TestDensitySummaries:
    """Validation density triptychs (input | GT | prediction) and the
    predict_density_maps limit plumbing."""

    def _settings(self, tmp_path, **kw):
        base = dict(trial_name="denssum",
                    logs_directory=str(tmp_path / "logs"),
                    batch_size=8, steps_to_run=3, summary_step_period=2,
                    labeled_dataset_size=6, unlabeled_dataset_size=8,
                    validation_dataset_size=3,
                    crowd_image_height=80, crowd_image_width=96,
                    image_patch_size=32, crowd_sigma=3.0,
                    crowd_synthetic_max_heads=12,
                    model_base_width=8, latent_dimension=16,
                    learning_rate=1e-3, seed=0)
        base.update(kw)
        return Settings(**base)

    def test_limit_prefix_of_full_maps(self, tmp_path):
        from srgan_tpu.apps.crowd import CrowdExperiment

        exp = CrowdExperiment(self._settings(tmp_path))
        exp.train()
        full = exp.predict_density_maps()
        one = exp.predict_density_maps(limit=1)
        assert full.shape == (3, 80 // 4, 96 // 4)
        assert one.shape == (1, 80 // 4, 96 // 4)
        np.testing.assert_allclose(one[0], full[0], rtol=1e-5)

    def test_counts_reuse_maps_program(self, tmp_path):
        """After training (triptychs compile the maps grid program),
        predict_image_counts reuses it: counts == host sum of canvases,
        and no counts-variant program gets compiled."""
        from srgan_tpu.apps.crowd import CrowdExperiment

        exp = CrowdExperiment(self._settings(tmp_path))
        exp.train()
        maps = exp.predict_density_maps()
        counts = exp.predict_image_counts()
        np.testing.assert_allclose(counts, maps.sum(axis=(1, 2)),
                                   rtol=1e-6)
        assert all(key[2] for key in exp._grid_count_fns)  # maps-only

    def test_only_maps_grid_programs_compiled(self, tmp_path):
        """Compile-count economy invariant (docs/design.md §7): a
        default trial (triptychs on) builds ONLY the maps variant of the
        grid program per model, and evaluate() reuses it — the
        device-summed counts variant is never constructed."""
        from srgan_tpu.apps.crowd import CrowdExperiment

        exp = CrowdExperiment(self._settings(tmp_path))
        exp.train()
        size = exp.validation_db.image_size
        assert set(exp._grid_count_fns) == {(size, False, True),
                                            (size, True, True)}
        exp.evaluate()
        exp.evaluate(use_dnn=True)
        assert set(exp._grid_count_fns) == {(size, False, True),
                                            (size, True, True)}

    def test_triptych_pngs_written(self, tmp_path):
        import glob
        from srgan_tpu.apps.crowd import CrowdExperiment

        exp = CrowdExperiment(self._settings(tmp_path))
        exp.train()
        for sub in ("GAN", "DNN"):
            pngs = glob.glob(os.path.join(
                exp.trial_directory, sub, "images",
                "validation_density_*.png"))
            assert len(pngs) >= 2, (sub, pngs)
        # triptych geometry: 3 panels side by side
        img = np.asarray(Image.open(pngs[0]))
        assert img.shape == (80, 3 * 96, 3)

    def test_disabled_writes_none(self, tmp_path):
        import glob
        from srgan_tpu.apps.crowd import CrowdExperiment

        exp = CrowdExperiment(self._settings(
            tmp_path, crowd_summary_image_count=0))
        exp.train()
        pngs = glob.glob(os.path.join(
            exp.trial_directory, "*", "images", "validation_density_*"))
        assert pngs == []


def test_empty_validation_split_writes_no_nan_scalars(tmp_path):
    """A validation_dataset_size=0 trial must not spam NaN validation
    scalars into TensorBoard each pass (it used to log NaN MAE/RMSE)."""
    import json
    import warnings
    from srgan_tpu.apps.crowd import CrowdExperiment

    exp = CrowdExperiment(Settings(
        trial_name="emptyval", logs_directory=str(tmp_path / "logs"),
        batch_size=8, steps_to_run=3, summary_step_period=2,
        labeled_dataset_size=6, unlabeled_dataset_size=8,
        validation_dataset_size=0,
        crowd_image_height=80, crowd_image_width=96,
        image_patch_size=32, model_base_width=8, latent_dimension=16))
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # NaN-in-summary warns → fail
        exp.train()
    scalars = os.path.join(exp.trial_directory, "GAN", "scalars.jsonl")
    if os.path.exists(scalars):
        for line in open(scalars):
            rec = json.loads(line)
            assert not rec["tag"].startswith("validation/"), rec


def test_export_density_maps_tiled_includes_image_ids(tmp_path):
    """--export_density_maps on a tiled (native-resolution) database
    must carry image_ids so consumers can aggregate tiles per source
    image."""
    from srgan_tpu.__main__ import _export_density_maps
    from srgan_tpu.apps.crowd import CrowdExperiment

    raw = tmp_path / "raw"
    raw.mkdir()
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (80, 120, 3), np.uint8)
    Image.fromarray(img).save(raw / "img_0001.jpg")
    savemat(raw / "img_0001_ann.mat",
            {"annPoints": np.array([[10.0, 20.0], [100.0, 60.0]])})
    db = UcfQnrfPreprocessor(height=40, width=60, sigma=3.0,
                             mode="tiles").preprocess(str(raw))
    root = tmp_path / "db"
    root.mkdir()
    for split in ("labeled", "unlabeled", "validation"):
        db.save(str(root / f"{split}.npz"))

    exp = CrowdExperiment(Settings(
        trial_name="tileexp", logs_directory=str(tmp_path / "logs"),
        crowd_database_path=str(root),
        crowd_image_height=40, crowd_image_width=60,
        batch_size=8, steps_to_run=2, summary_step_period=2,
        image_patch_size=16, model_base_width=8, latent_dimension=16))
    exp.train()
    out = str(tmp_path / "maps.npz")
    _export_density_maps(exp, out)
    with np.load(out) as z:
        assert z["validation"].shape == (4, 10, 15)  # 4 tiles of 40x60
        np.testing.assert_array_equal(z["validation_image_ids"],
                                      [0, 0, 0, 0])


def test_preprocessor_drops_non_finite_head_annotations(tmp_path):
    """A NaN/inf annotation point (real-world .mat corruption) must be
    dropped, not rendered into a NaN density map poisoning the image."""
    raw = tmp_path / "raw"
    raw.mkdir()
    rng = np.random.default_rng(0)
    Image.fromarray(rng.integers(0, 255, (40, 48, 3), np.uint8)).save(
        raw / "img_0001.jpg")
    savemat(raw / "img_0001_ann.mat",
            {"annPoints": np.array([[10.0, 20.0],
                                    [np.nan, 5.0],
                                    [7.0, np.inf],
                                    [30.0, 15.0]])})
    db = UcfQnrfPreprocessor(height=40, width=48,
                             sigma=3.0).preprocess(str(raw))
    assert np.isfinite(db.density_maps).all()
    np.testing.assert_allclose(db.density_maps.sum(), 2.0, rtol=1e-4)
    np.testing.assert_allclose(db.head_counts, [2.0], rtol=1e-4)


def test_database_load_rejects_non_finite_labels(tmp_path):
    """A corrupted npz (NaN density) must fail at load with a pointer to
    the data, not steps later as unexplained NaN losses."""
    db = synthetic_crowd_database(2, height=16, width=16, max_heads=4,
                                  sigma=2.0)
    path = str(tmp_path / "labeled.npz")
    db.save(path)
    data = dict(np.load(path))
    data["density_maps"][0, 3, 3] = np.nan
    np.savez(path, **data)
    with pytest.raises(ValueError, match="non-finite"):
        CrowdDatabase.load(path)


class TestHeadInit:
    """Zero-init heads + dataset-mean biases (VERDICT r3 #1): the step-0
    prediction must BE the dataset mean, killing the thousands-of-steps
    count-head warm-up (BASELINE.md '2000 steps is noise' negative)."""

    def _experiment(self, **overrides):
        from srgan_tpu.apps.crowd import CrowdExperiment

        settings = Settings(
            batch_size=4, labeled_dataset_size=6, unlabeled_dataset_size=6,
            validation_dataset_size=2, test_dataset_size=2,
            image_patch_size=32, crowd_image_height=64,
            crowd_image_width=64, model_base_width=8,
            compute_dtype="float32", **overrides)
        exp = CrowdExperiment(settings)
        exp.dataset_setup()
        return exp

    def test_step0_prediction_is_dataset_mean(self):
        import jax.numpy as jnp

        exp = self._experiment()
        models, d_params, _, dnn_params = exp.model_setup()
        mu = float(np.mean(exp.labeled_db.density_maps))
        p = exp.settings.image_patch_size
        x = jnp.asarray(np.random.default_rng(0).normal(
            size=(2, p, p, 3)), jnp.float32)
        for apply, params in ((models.d_apply, d_params),
                              (models.dnn_apply, dnn_params)):
            (density, count), _ = apply(params, x)
            # density head: per-cell sum-pool target = 16*mu
            np.testing.assert_allclose(np.asarray(density), mu * 16,
                                       rtol=1e-5)
            # count head: patch total = mu * p^2
            np.testing.assert_allclose(np.asarray(count).sum(axis=(1, 2)),
                                       mu * p * p, rtol=1e-4)

    def test_aux_mode_density_bias_is_mean_aux(self):
        import jax.numpy as jnp

        exp = self._experiment(crowd_label_type="knn")
        models, d_params, _, _ = exp.model_setup()
        mean_aux = float(np.mean(exp.labeled_db.aux_maps))
        p = exp.settings.image_patch_size
        x = jnp.zeros((1, p, p, 3), jnp.float32)
        (density, _), _ = models.d_apply(d_params, x)
        # aux targets are MEAN-pooled (value-like), so the bias is the
        # plain mean aux value, not 16x it
        np.testing.assert_allclose(np.asarray(density), mean_aux,
                                   rtol=1e-5)

    def test_opt_out_restores_default_init(self):
        import jax

        exp = self._experiment(zero_init_heads=False)
        _, d_params, _, _ = exp.model_setup()
        leaves = {"/".join(map(str, path)): leaf for path, leaf in
                  jax.tree_util.tree_flatten_with_path(d_params)[0]}
        kernel = [v for k, v in leaves.items()
                  if "count_head" in k and "kernel" in k]
        assert kernel and np.abs(np.asarray(kernel[0])).max() > 0.0


def test_gradient_clip_norm_setting():
    """gradient_clip_norm > 0 clips BEFORE Adam: two gradients above the
    threshold that differ only in scale must produce identical updates."""
    import jax.numpy as jnp
    from srgan_tpu.train import make_optimizer

    settings = Settings(gradient_clip_norm=1.0)
    tx = make_optimizer(settings)
    params = {"w": jnp.zeros((3,))}
    g = {"w": jnp.array([30.0, 40.0, 0.0])}  # norm 50 >> 1
    g_big = {"w": jnp.array([3000.0, 4000.0, 0.0])}
    state = tx.init(params)
    u1, _ = tx.update(g, state, params)
    u2, _ = tx.update(g_big, state, params)
    np.testing.assert_allclose(np.asarray(u1["w"]), np.asarray(u2["w"]),
                               rtol=1e-6)
    # and the off switch keeps plain Adam (scale-invariant in Adam's
    # first step anyway, so check the state structure instead)
    assert make_optimizer(Settings()) is not None


class TestImageNormalization:
    """Settings.image_normalization (SURVEY §2 6c [H]: 'mean/std or
    [-1,1]'): the 'meanstd' variant maps the framework's [-1,1] image
    space to (x/255-mean_c)/std_c inside the D/DNN apply, so every input
    tier and the G->D fake stream share one transform."""

    def _experiment(self, **overrides):
        from srgan_tpu.apps.crowd import CrowdExperiment

        settings = Settings(
            batch_size=4, labeled_dataset_size=6, unlabeled_dataset_size=6,
            validation_dataset_size=2, test_dataset_size=2,
            image_patch_size=32, crowd_image_height=64,
            crowd_image_width=64, model_base_width=8,
            compute_dtype="float32", **overrides)
        exp = CrowdExperiment(settings)
        exp.dataset_setup()
        return exp

    def test_wrapped_apply_matches_host_formula(self):
        import jax.numpy as jnp
        from srgan_tpu.models.crowd import CROWD_MODELS

        exp = self._experiment(image_normalization="meanstd")
        models, d_params, _, _ = exp.model_setup()
        mean, std = exp.labeled_db.image_statistics()
        x = jnp.asarray(np.random.default_rng(0).uniform(
            -1, 1, (2, 32, 32, 3)), jnp.float32)
        got, _ = models.d_apply(d_params, x)
        # reference formula: pixels p=(x+1)/2 in [0,1], then (p-m)/s
        raw = CROWD_MODELS["jointcnn"](base_width=8)
        manual = (np.asarray(x) * 0.5 + 0.5 - mean) / std
        want, _ = raw.apply(d_params, jnp.asarray(manual))
        np.testing.assert_allclose(np.asarray(got[0]),
                                   np.asarray(want[0]), rtol=1e-5,
                                   atol=1e-6)

    def test_statistics_persist_through_save_load(self, tmp_path):
        db = synthetic_crowd_database(3, height=16, width=16, max_heads=4,
                                      sigma=2.0)
        mean, std = db.image_statistics()
        assert mean.shape == (3,) and std.shape == (3,)
        assert (std > 0).all()
        path = str(tmp_path / "labeled.npz")
        db.save(path)
        loaded = CrowdDatabase.load(path)
        np.testing.assert_allclose(loaded.image_mean, mean)
        np.testing.assert_allclose(loaded.image_std, std)

    def test_preprocessor_stores_statistics(self, tmp_path):
        raw = tmp_path / "raw"
        raw.mkdir()
        _write_image(raw / "img_0001.jpg", h=40, w=48)
        savemat(raw / "img_0001_ann.mat",
                {"annPoints": np.array([[10.0, 20.0]])})
        db = UcfQnrfPreprocessor(height=40, width=48,
                                 sigma=3.0).preprocess(str(raw))
        assert db.image_mean is not None and db.image_std is not None

    def test_meanstd_trains_finite(self, tmp_path):
        exp = self._experiment(
            image_normalization="meanstd", trial_name="meanstd",
            logs_directory=str(tmp_path / "logs"), steps_to_run=3,
            summary_step_period=2, latent_dimension=8, seed=0,
            data_parallel_devices=1)
        state = exp.train()
        result = exp.evaluate()
        assert np.isfinite(result["MAE"])

    def test_unknown_mode_raises(self):
        exp = self._experiment(image_normalization="zscore")
        with pytest.raises(ValueError, match="image_normalization"):
            exp.model_setup()

    def test_image_apps_reject_meanstd(self, tmp_path):
        from srgan_tpu.apps.age import AgeExperiment

        settings = Settings(
            batch_size=4, labeled_dataset_size=4, unlabeled_dataset_size=4,
            validation_dataset_size=2, test_dataset_size=2,
            age_image_size=32, model_base_width=8, latent_dimension=8,
            image_normalization="meanstd")
        exp = AgeExperiment(settings)
        exp.dataset_setup()
        with pytest.raises(ValueError, match="crowd app only"):
            exp.model_setup()


@pytest.mark.parametrize("config", [
    dict(n=0, k=1), dict(n=1, k=1), dict(n=40, k=3),
    dict(n=200, k=1, origin=(64.0, 128.0)),
    dict(n=7, k=12),  # k > heads clamps
])
def test_knn_tree_matches_chunked_golden(config):
    """generate_knn_map's cKDTree form (the UCF-QNRF-scale fix measured
    ~100x faster by tools/ucf_qnrf_rehearsal.py) must match the
    brute-force chunked golden implementation."""
    from srgan_tpu.data.crowd import (_generate_knn_map_chunked,
                                      generate_knn_map)

    rng = np.random.default_rng(config["n"])
    heads = rng.uniform(-20, 150, (config["n"], 2)).astype(np.float32)
    kw = dict(k=config["k"], origin=config.get("origin", (0.0, 0.0)),
              empty_value=333.0)
    got = generate_knn_map(heads, 48, 64, **kw)
    want = _generate_knn_map_chunked(heads, 48, 64, **kw)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-4)
