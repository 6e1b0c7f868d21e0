"""FastGroupNorm: numerical closeness to flax GroupNorm and end-to-end
training with the throughput knob on."""

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from srgan_tpu.models.dcgan import FastGroupNorm


def test_matches_flax_groupnorm_fp32():
    """In f32 the fast variant must agree with flax almost exactly."""
    key = jax.random.key(0)
    x = jax.random.normal(key, (4, 8, 8, 32)) * 3.0 + 1.0
    fast = FastGroupNorm(num_groups=8, dtype=jnp.float32)
    ref = nn.GroupNorm(num_groups=8)
    fp = fast.init(key, x)
    rp = ref.init(key, x)
    np.testing.assert_allclose(np.asarray(fast.apply(fp, x)),
                               np.asarray(ref.apply(rp, x)),
                               rtol=1e-4, atol=1e-5)


def test_bf16_stats_close_to_f32_stats():
    key = jax.random.key(1)
    x = jax.random.normal(key, (2, 16, 16, 64)) * 5.0
    fast = FastGroupNorm(num_groups=16, dtype=jnp.bfloat16)
    ref = nn.GroupNorm(num_groups=16, dtype=jnp.bfloat16)
    fp = fast.init(key, x)
    rp = ref.init(key, x)
    got = np.asarray(fast.apply(fp, x), np.float32)
    want = np.asarray(ref.apply(rp, x), np.float32)
    # bf16 statistics vs f32 statistics: within bf16 resolution
    np.testing.assert_allclose(got, want, rtol=0.05, atol=0.05)


def test_non_divisible_channels():
    """Group count falls back to a divisor of the channel count."""
    key = jax.random.key(2)
    x = jnp.ones((1, 4, 4, 6))
    norm = FastGroupNorm(num_groups=4, dtype=jnp.float32)  # 6 % 4 != 0
    params = norm.init(key, x)
    out = norm.apply(params, x)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()


def test_crowd_trains_with_fast_norm(tmp_path):
    from srgan_tpu.apps.crowd import CrowdExperiment
    from srgan_tpu.settings import Settings

    settings = Settings(
        trial_name="fastnorm", logs_directory=str(tmp_path / "logs"),
        batch_size=8, steps_to_run=3, summary_step_period=2,
        labeled_dataset_size=6, unlabeled_dataset_size=8,
        validation_dataset_size=3, crowd_image_height=80,
        crowd_image_width=96, image_patch_size=32, crowd_sigma=3.0,
        model_base_width=8, latent_dimension=16,
        compute_dtype="bfloat16", norm_impl="fast")
    exp = CrowdExperiment(settings)
    state = exp.train()
    assert int(jax.device_get(state.step)) == 3
    assert np.isfinite(exp.evaluate()["MAE"])
