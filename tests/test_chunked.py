"""Chunked multi-step dispatch (``Settings.steps_per_dispatch``).

The K-step unrolled chunk (apps/crowd.py `_prepare_train_chunk`) must
consume the SAME host patch-arg draws and the SAME key chain as K
sequential per-step dispatches. The step MATH is the same program; only
XLA's fusion differs (one chunk executable vs separate executables), so
per-step metrics agree to float-fusion tolerance (~1e-6 relative; exact
equality is not guaranteed because fused reductions may reassociate — Adam
then amplifies ulps over many steps, which is why the parity check compares
the metric trace of a short run, not final params of a long one).
"""

import os

import jax
import numpy as np
import pytest

from srgan_tpu.settings import Settings
from srgan_tpu.train import init_train_state
from srgan_tpu.utils.seeding import KeySequence


def _settings(tmp_path, **kw):
    base = dict(trial_name="chunktest",
                logs_directory=str(tmp_path / "logs"),
                batch_size=8, steps_to_run=4, summary_step_period=2,
                validation_step_period=4,
                labeled_dataset_size=6, unlabeled_dataset_size=8,
                validation_dataset_size=2,
                crowd_image_height=64, crowd_image_width=64,
                image_patch_size=32, crowd_sigma=3.0,
                crowd_synthetic_max_heads=12,
                model_base_width=8, latent_dimension=16,
                learning_rate=1e-3, seed=0)
    base.update(kw)
    return Settings(**base)


def _manual_experiment(tmp_path, **kw):
    from srgan_tpu.apps.crowd import CrowdExperiment

    exp = CrowdExperiment(_settings(tmp_path, **kw))
    exp.dataset_setup()
    models, d, g, dnn = exp.model_setup()
    exp.models = models
    exp.state = init_train_state(exp.settings, d, g, dnn)
    exp.prepare_mesh()
    exp.prepare_train_step()
    return exp


class TestKeyChainHandoff:
    def test_take_restore_matches_next_stream(self):
        keys = KeySequence(7, "train")
        expected = [keys.next() for _ in range(3)]
        tail = keys.next()

        keys2 = KeySequence(7, "train")
        chain = keys2.take()
        subs = []
        for _ in range(3):
            chain, sub = jax.random.split(chain)
            subs.append(sub)
        keys2.restore(chain)
        for want, got in zip(expected, subs):
            np.testing.assert_array_equal(jax.random.key_data(want),
                                          jax.random.key_data(got))
        np.testing.assert_array_equal(jax.random.key_data(tail),
                                      jax.random.key_data(keys2.next()))


class TestChunkedTraining:
    @pytest.mark.parametrize("shard", [False, True])
    def test_chunk_matches_per_step_metric_trace(self, tmp_path, shard):
        """One K=2 chunk reproduces two sequential per-step dispatches:
        same data draws, same keys, metrics equal to fusion tolerance.
        Step 1's metrics depend on step 0's parameter update, so trace
        agreement proves the whole chain (state, keys, args order)."""
        K = 2
        e1 = _manual_experiment(tmp_path / "k1", crowd_shard_dataset=shard)
        keys1 = KeySequence(0, "train")
        args1 = e1._patch_args_stream()
        data1 = e1._device_data
        per_step = []
        for _ in range(K):
            p, l, u = e1._sample_batch(
                data1["labeled_images"], data1["labeled_density"],
                data1["unlabeled_images"], *next(args1))
            e1.state, m = e1._train_step(e1.state, p, l, u, keys1.next())
            per_step.append({k: float(v)
                             for k, v in jax.device_get(m).items()})

        e2 = _manual_experiment(tmp_path / "k2", crowd_shard_dataset=shard,
                                steps_per_dispatch=K)
        keys2 = KeySequence(0, "train")
        args2 = e2._patch_args_stream()
        data2 = e2._device_data
        stacked = [np.stack(col)
                   for col in zip(*(next(args2) for _ in range(K)))]
        e2.state, chain, ms = e2._train_chunk(
            e2.state, keys2.take(), data2["labeled_images"],
            data2["labeled_density"], data2["unlabeled_images"], *stacked)
        keys2.restore(chain)
        ms = jax.device_get(ms)
        for i in range(K):
            for name, want in per_step[i].items():
                np.testing.assert_allclose(
                    float(ms[name][i]), want, rtol=1e-4, atol=1e-6,
                    err_msg=f"step {i} metric {name}")
        assert int(jax.device_get(e2.state.step)) == K
        # the handed-back chain continues the same stream
        np.testing.assert_array_equal(
            jax.random.key_data(keys1.next()),
            jax.random.key_data(keys2.next()))

    def test_end_to_end_chunked_trial(self, tmp_path):
        """The public train() loop at K=2: step accounting, summaries and
        periodic validation all land on the per-step loop's steps."""
        from srgan_tpu.apps.crowd import CrowdExperiment

        exp = CrowdExperiment(_settings(tmp_path, steps_per_dispatch=2))
        state = exp.train()
        assert int(jax.device_get(state.step)) == 4
        result = exp.evaluate()
        assert np.isfinite(result["MAE"])
        gan_scalars = os.path.join(exp.trial_directory, "GAN",
                                   "scalars.jsonl")
        assert os.path.exists(gan_scalars)
        with open(gan_scalars) as f:
            tags = {__import__("json").loads(line)["tag"] for line in f}
        assert "d_total_loss" in tags       # chunk-start step summaries
        assert "validation/MAE" in tags     # validation_step_period=4 hit

    def test_resume_roundtrip(self, tmp_path):
        """Checkpoint + resume through the chunked loop: state restores,
        the chunk-aligned start step passes the divisibility check, and
        training continues to the new total."""
        from srgan_tpu.apps.crowd import CrowdExperiment

        first = CrowdExperiment(_settings(tmp_path, steps_per_dispatch=2,
                                          steps_to_run=2))
        first.train()
        resumed = CrowdExperiment(_settings(
            tmp_path, steps_per_dispatch=2, steps_to_run=6,
            load_model_path=first.trial_directory))
        state = resumed.train()
        assert int(jax.device_get(state.step)) == 6
        assert np.isfinite(resumed.evaluate()["MAE"])

    def test_resume_misaligned_start_rejected(self, tmp_path):
        """A checkpoint at a step that is not a multiple of K cannot
        silently shift the period grid — it must fail fast."""
        from srgan_tpu.apps.crowd import CrowdExperiment

        first = CrowdExperiment(_settings(tmp_path, steps_to_run=2,
                                          summary_step_period=2,
                                          validation_step_period=2))
        first.train()
        resumed = CrowdExperiment(_settings(
            tmp_path, steps_per_dispatch=4, steps_to_run=8,
            summary_step_period=4, validation_step_period=4,
            load_model_path=first.trial_directory))
        with pytest.raises(ValueError, match="resumed step"):
            resumed.train()

    def test_divisibility_errors(self, tmp_path):
        from srgan_tpu.apps.crowd import CrowdExperiment

        with pytest.raises(ValueError, match="multiple of"):
            CrowdExperiment(_settings(
                tmp_path, steps_per_dispatch=3)).train()  # 4 % 3 != 0

    def test_dnn_only_rejected(self, tmp_path):
        from srgan_tpu.apps.crowd import CrowdExperiment

        with pytest.raises(ValueError, match="dnn_only"):
            CrowdExperiment(_settings(
                tmp_path, steps_per_dispatch=2, dnn_only=True)).train()

    def test_base_experiment_rejects_chunking(self, tmp_path):
        from srgan_tpu.apps.coefficient import CoefficientExperiment

        settings = Settings(
            trial_name="chunkcoef", logs_directory=str(tmp_path / "logs"),
            batch_size=8, steps_to_run=4, steps_per_dispatch=2,
            labeled_dataset_size=8, unlabeled_dataset_size=8,
            validation_dataset_size=8, hidden_size=4, latent_dimension=4)
        with pytest.raises(ValueError, match="on-device input pipeline"):
            CoefficientExperiment(settings).train()
