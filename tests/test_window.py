"""Window-tier tests (data/window.py + apps/crowd.py integration): the
dataset-scale double-buffered HBM input queue for larger-than-HBM
databases (SURVEY.md §2 native-checklist (b); BASELINE.json north star's
"double-buffered HBM input queue").

Pinned properties:
- SliceStream covers every example exactly once per pass (no starvation).
- HBMWindow device contents track the deterministic rotation exactly
  (constant-valued images keyed by global id make contents checkable).
- Full-rotation coverage: across one pass, every example of the split is
  resident (and therefore samplable) at some point — the VERDICT r4
  done-criterion (b).
- CrowdExperiment integration: training with a window produces finite
  losses, the sampler's index bound shrinks to the window, the budget
  check accounts windows, and the tier composes with dataset sharding
  and the K-step dispatch chunk.
"""

import numpy as np
import pytest

from srgan_tpu.settings import Settings


def _constant_id_images(n, h=16, w=16):
    """images[i] == i everywhere (u8): device contents identify the id."""
    return (np.arange(n, dtype=np.uint8)[:, None, None, None]
            * np.ones((1, h, w, 3), np.uint8))


class TestSliceStream:
    def test_full_coverage_each_pass(self):
        from srgan_tpu.data.window import SliceStream

        stream = SliceStream(num_examples=10, slice_size=3, seed=[0, 7])
        seen = []
        # 30 ids = 3 complete passes of 10 (slices cross pass boundaries).
        for _ in range(10):
            ids = stream.next_ids()
            assert ids.shape == (3,)
            seen.extend(ids.tolist())
        for p in range(3):
            chunk = sorted(seen[p * 10:(p + 1) * 10])
            assert chunk == list(range(10)), f"pass {p} missed examples"

    def test_deterministic(self):
        from srgan_tpu.data.window import SliceStream

        a = SliceStream(8, 4, seed=1)
        b = SliceStream(8, 4, seed=1)
        for _ in range(5):
            np.testing.assert_array_equal(a.next_ids(), b.next_ids())

    def test_validation(self):
        from srgan_tpu.data.window import SliceStream

        with pytest.raises(ValueError):
            SliceStream(0, 2, seed=0)
        with pytest.raises(ValueError):
            SliceStream(4, 0, seed=0)


class TestHBMWindow:
    def _make(self, n=12, window=6, slices=3, period=2, d=1):
        import jax

        from srgan_tpu.data.window import HBMWindow, slice_update_factory
        from srgan_tpu.parallel import mesh as pmesh

        images = _constant_id_images(n)
        if d > 1:
            mesh = pmesh.make_mesh(d)
            sharding = pmesh.batch_sharding(mesh)
            make_update = slice_update_factory(mesh, sharded=True)
        else:
            sharding = None
            make_update = slice_update_factory()

        put = (lambda a: jax.device_put(a, sharding)) if sharding \
            else jax.device_put
        window = HBMWindow(
            ["images"], [lambda ids, a=images: a[ids]], n,
            window, slices, seed=[0, 7, 0], put=put, num_shards=d,
            make_update=make_update, refresh_period=period)
        return window

    def test_device_contents_track_rotation(self):
        import jax

        window = self._make()
        try:
            for step in range(1, 13):
                window.maybe_refresh(step)
                resident = window.resident_ids()
                device = np.asarray(
                    jax.device_get(window.arrays["images"]))[:, 0, 0, 0]
                np.testing.assert_array_equal(
                    device.astype(np.int64), resident,
                    err_msg=f"step {step}: device window diverged from "
                            f"host bookkeeping")
        finally:
            window.close()

    def test_full_rotation_coverage(self):
        """Every example becomes resident across one pass (done-criterion
        (b): no window starvation bias)."""
        n = 12
        window = self._make(n=n, window=6, slices=3, period=1)
        try:
            seen = set(window.resident_ids().tolist())
            # One pass = n/slice_size additional... the initial fill already
            # consumed 3 slices (6 ids); 3+ more refreshes finish pass 0.
            for step in range(1, 10):
                window.maybe_refresh(step)
                seen.update(window.resident_ids().tolist())
            assert seen == set(range(n))
        finally:
            window.close()

    def test_deterministic_schedule_is_step_pure(self):
        """Two windows driven over the same steps hold identical content
        (refresh_period > 0 ⇒ content is a pure function of seed+step)."""
        a = self._make(period=3)
        b = self._make(period=3)
        try:
            for step in range(1, 10):
                a.maybe_refresh(step)
                b.maybe_refresh(step)
                np.testing.assert_array_equal(a.resident_ids(),
                                              b.resident_ids())
            assert a.refresh_count == b.refresh_count == 3
        finally:
            a.close()
            b.close()

    def test_opportunistic_never_blocks_and_refreshes(self):
        """period=0: refreshes land when transfers complete; after enough
        polls (CPU transfers are fast) the window has rotated."""
        import time

        window = self._make(period=0)
        try:
            deadline = time.monotonic() + 30.0
            step = 0
            while window.refresh_count < 4:
                step += 1
                window.maybe_refresh(step)
                if time.monotonic() > deadline:  # pragma: no cover
                    pytest.fail("opportunistic window never refreshed")
                time.sleep(0.01)
        finally:
            window.close()

    def test_sharded_window_contents(self):
        """8-way sharded window: global rotation distributed shard-major,
        shard_map update — device contents match host bookkeeping row for
        row."""
        import jax

        window = self._make(n=32, window=16, slices=2, period=1, d=8)
        try:
            seen = set(window.resident_ids().tolist())
            for step in range(1, 6):
                window.maybe_refresh(step)
                device = np.asarray(
                    jax.device_get(window.arrays["images"]))[:, 0, 0, 0]
                np.testing.assert_array_equal(device.astype(np.int64),
                                              window.resident_ids())
                seen.update(window.resident_ids().tolist())
            # Initial fill (16) + 5 refreshes (8 each) = 56 ids > one
            # 32-id pass: every example has been resident on SOME shard.
            assert seen == set(range(32))
        finally:
            window.close()

    def test_sharded_window_uniform_when_not_divisible(self):
        """Split size not divisible by the shard count: every example is
        still resident exactly once per global pass (fixed per-shard
        blocks of unequal size would over-sample the small blocks)."""
        n = 10  # 10 examples, 8 shards: fixed blocks would be 2s and 1s
        window = self._make(n=n, window=16, slices=2, period=1, d=8)
        try:
            for step in range(1, 4):
                assert window.maybe_refresh(step)
            # The window feeds on ONE global stream: its slice draws cover
            # every example exactly once per pass, so residency frequency
            # is uniform. Check the same stream's per-pass coverage.
            from srgan_tpu.data.window import SliceStream
            stream = SliceStream(n, 8, seed=[0, 7, 0])
            drawn = np.concatenate([stream.next_ids() for _ in range(5)])
            for p in range(4):
                np.testing.assert_array_equal(
                    np.sort(drawn[p * n:(p + 1) * n]), np.arange(n))
        finally:
            window.close()

    def test_staging_thread_is_daemon(self):
        """Process exit must never block on the always-in-flight staged
        transfer (remote-TPU tunnel hangs are unbounded — CLAUDE.md)."""
        window = self._make()
        try:
            assert window._stager._thread.daemon
        finally:
            window.close()

    def test_divisibility_validation(self):
        with pytest.raises(ValueError, match="divide"):
            self._make(window=7, slices=3)
        with pytest.raises(ValueError, match="shard count"):
            self._make(n=32, window=16, slices=16, d=8)  # R=1 < d


class TestCrowdWindowIntegration:
    def _settings(self, tmp_path, **overrides):
        base = dict(
            trial_name="win", logs_directory=str(tmp_path / "logs"),
            batch_size=8, image_patch_size=16, crowd_image_height=32,
            crowd_image_width=32, model_base_width=8, latent_dimension=8,
            labeled_dataset_size=24, unlabeled_dataset_size=24,
            validation_dataset_size=2, test_dataset_size=2,
            crowd_sigma=2.0, steps_to_run=6, summary_step_period=3,
            crowd_hbm_window=8, crowd_window_slices=4,
            crowd_window_refresh_period=1)
        base.update(overrides)
        return Settings(**base)

    def test_train_smoke_and_bounds(self, tmp_path):
        from srgan_tpu.apps.crowd import CrowdExperiment

        exp = CrowdExperiment(self._settings(tmp_path))
        state = exp.train()
        assert int(np.asarray(state.step)) == 6
        # Two windows (labeled + unlabeled), rotated during training.
        assert len(exp._windows) == 2
        assert all(w.refresh_count >= 4 for w in exp._windows)
        # The sampler's index space is the window, not the split.
        assert exp._labeled_index_bound == 8
        assert exp._unlabeled_index_bound == 8
        result = exp.evaluate()
        assert np.isfinite(result["MAE"])

    def test_windowed_matches_resident_when_content_identical(self,
                                                              tmp_path):
        """With every example identical, the windowed run's losses equal
        the fully-resident run's (same patch-arg stream, same content) —
        pins that windowing changes WHERE data lives, not the math."""
        import jax

        from srgan_tpu.apps.crowd import CrowdExperiment
        from srgan_tpu.train import init_train_state

        def losses(window):
            settings = self._settings(
                tmp_path, crowd_hbm_window=window, steps_to_run=0)
            exp = CrowdExperiment(settings)
            exp.dataset_setup()
            # Make all examples byte-identical AFTER setup.
            exp.labeled_db.images[:] = exp.labeled_db.images[0]
            exp.labeled_db.density_maps[:] = exp.labeled_db.density_maps[0]
            exp.unlabeled_db.images[:] = exp.unlabeled_db.images[0]
            models, d, g, dnn = exp.model_setup()
            exp.models = models
            exp.state = init_train_state(exp.settings, d, g, dnn)
            exp.prepare_mesh()
            exp.prepare_train_step()
            out = []
            epochs = exp.epoch_batch_iterators()
            from srgan_tpu.utils.seeding import KeySequence
            keys = KeySequence(exp.settings.seed, "train")
            it = (batch for epoch in epochs for batch in epoch)
            for _ in range(4):
                patches, labels, upatches = next(it)
                exp.state, metrics = exp._train_step(
                    exp.state, patches, labels, upatches, keys.next())
                out.append(float(jax.device_get(
                    metrics["d_total_loss"])))
            exp.close()
            return out

        np.testing.assert_allclose(losses(0), losses(8), rtol=1e-5)

    def test_budget_check_accounts_window(self, monkeypatch, tmp_path):
        """A too-big split stops warning once a window bounds residency."""
        import jax
        import warnings as warnings_mod

        from srgan_tpu.apps.crowd import CrowdExperiment
        from srgan_tpu.train import init_train_state

        def build(window):
            # Assumed capacity 200 KB: the full splits (~252 KB) exceed
            # the 60% threshold; the 8/24 window (~88 KB) clears it.
            exp = CrowdExperiment(self._settings(
                tmp_path, crowd_hbm_window=window, device_hbm_gb=2e-4))
            exp.dataset_setup()
            models, d, g, dnn = exp.model_setup()
            exp.models = models
            exp.state = init_train_state(exp.settings, d, g, dnn)
            exp.prepare_mesh()
            return exp

        class NoStats:
            def memory_stats(self):
                return None

        monkeypatch.setattr(jax, "devices", lambda *a: [NoStats()])
        with pytest.warns(UserWarning, match="crowd_hbm_window"):
            build(0)._check_hbm_budget()
        with warnings_mod.catch_warnings():
            warnings_mod.simplefilter("error")
            build(8)._check_hbm_budget()

    def test_host_pipeline_conflict(self, tmp_path):
        from srgan_tpu.apps.crowd import CrowdExperiment

        exp = CrowdExperiment(self._settings(
            tmp_path, crowd_host_pipeline=True))
        with pytest.raises(ValueError, match="mutually exclusive"):
            exp.train()

    def test_sharded_window_train_smoke(self, tmp_path):
        from srgan_tpu.apps.crowd import CrowdExperiment

        exp = CrowdExperiment(self._settings(
            tmp_path, crowd_shard_dataset=True, crowd_hbm_window=16,
            crowd_window_slices=2, batch_size=8))
        state = exp.train()
        assert int(np.asarray(state.step)) == 6
        assert len(exp._windows) == 2
        assert np.isfinite(exp.evaluate()["MAE"])

    def test_chunked_dispatch_with_window(self, tmp_path):
        from srgan_tpu.apps.crowd import CrowdExperiment

        exp = CrowdExperiment(self._settings(
            tmp_path, steps_per_dispatch=2,
            crowd_window_refresh_period=2, steps_to_run=6,
            summary_step_period=2, validation_step_period=2))
        state = exp.train()
        assert int(np.asarray(state.step)) == 6
        assert all(w.refresh_count >= 2 for w in exp._windows)

    def test_window_resume(self, tmp_path):
        """Checkpoint + resume with the window tier: the resumed run
        rotates in a fresh order (streams fold in the restored step,
        like every other data RNG) and trains to completion."""
        from srgan_tpu.apps.crowd import CrowdExperiment

        first = CrowdExperiment(self._settings(tmp_path, steps_to_run=4))
        first.train()
        resumed = CrowdExperiment(self._settings(
            tmp_path, steps_to_run=8,
            load_model_path=first.trial_directory))
        state = resumed.train()
        assert int(np.asarray(state.step)) == 8
        assert all(w.refresh_count >= 2 for w in resumed._windows)
        assert np.isfinite(resumed.evaluate()["MAE"])

    def test_evaluation_only_skips_training_uploads(self, tmp_path):
        """prepare_for_evaluation never uploads training splits or spins
        window staging threads: grid eval reads only validation images —
        on the multi-GB databases the window tier serves, those uploads
        cost minutes of transfer evaluation never uses."""
        from srgan_tpu.apps.crowd import CrowdExperiment

        trained = CrowdExperiment(self._settings(tmp_path, steps_to_run=2,
                                                 summary_step_period=2))
        trained.train()
        evaluator = CrowdExperiment(self._settings(tmp_path))
        evaluator.prepare_for_evaluation(trained.trial_directory)
        assert evaluator._windows == []
        assert "labeled_images" not in evaluator._device_data
        assert "unlabeled_images" not in evaluator._device_data
        assert np.isfinite(evaluator.evaluate()["MAE"])
        # Eval-then-train on the SAME object must not leak the eval-only
        # upload skips into the training run (found by code review r5).
        state = evaluator.train()
        assert int(np.asarray(state.step)) == 6
        assert "labeled_images" in evaluator._device_data
        evaluator.close()

    def test_zero_window_slices_is_config_error(self, tmp_path):
        """crowd_window_slices=0 with an active window must raise a
        descriptive ValueError, not ZeroDivisionError in the budget
        arithmetic."""
        from srgan_tpu.apps.crowd import CrowdExperiment

        exp = CrowdExperiment(self._settings(tmp_path,
                                             crowd_window_slices=0))
        with pytest.raises(ValueError, match="crowd_window_slices"):
            exp.train()

    def test_labeled_unlabeled_windows_rotate_independently(self,
                                                            tmp_path):
        """Equal-sized splits must NOT rotate through identical id
        sequences (distinct stream folds per window)."""
        from srgan_tpu.apps.crowd import CrowdExperiment
        from srgan_tpu.train import init_train_state

        exp = CrowdExperiment(self._settings(tmp_path, steps_to_run=0))
        exp.dataset_setup()
        models, d, g, dnn = exp.model_setup()
        exp.models = models
        exp.state = init_train_state(exp.settings, d, g, dnn)
        exp.prepare_mesh()
        exp.prepare_train_step()
        lab, unl = exp._windows
        assert not np.array_equal(lab.resident_ids(), unl.resident_ids())
        exp.close()

    def test_chunked_dispatch_period_validation(self, tmp_path):
        from srgan_tpu.apps.crowd import CrowdExperiment

        exp = CrowdExperiment(self._settings(
            tmp_path, steps_per_dispatch=2,
            crowd_window_refresh_period=3, steps_to_run=6,
            summary_step_period=2, validation_step_period=2))
        with pytest.raises(ValueError, match="multiple"):
            exp.train()
