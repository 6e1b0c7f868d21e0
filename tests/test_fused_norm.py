"""Parity tests: Pallas fused GroupNorm+activation vs the flax/XLA path.

The fused kernel (ops/fused_norm.py) must be numerically interchangeable
with ``nn.GroupNorm`` + ``leaky_relu`` at every differentiation order the
training step uses: forward, first-order reverse (G/DNN updates, the
penalty's inner input-gradient), and the gradient penalty's mixed
second-order (∂/∂params of ∂/∂inputs). CPU runs the kernels in interpreter
mode — the same kernel code Mosaic compiles on hardware.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from srgan_tpu.ops.fused_norm import (FusedGroupNormAct, _reference_bwd,
                                      _reference_fwd, group_norm_act)


def flax_gn_act(x, scale, bias, groups, slope, eps=1e-6):
    gn = nn.GroupNorm(num_groups=groups, epsilon=eps)
    params = {"params": {"scale": scale, "bias": bias}}
    y = gn.apply(params, x)
    return nn.leaky_relu(y, slope) if slope else nn.relu(y)


def make_inputs(key, shape, dtype=jnp.float32):
    k1, k2, k3 = jax.random.split(key, 3)
    x = jax.random.normal(k1, shape, dtype)
    c = shape[-1]
    scale = 1.0 + 0.1 * jax.random.normal(k2, (c,))
    bias = 0.1 * jax.random.normal(k3, (c,))
    return x, scale, bias


@pytest.mark.parametrize("shape,groups,slope", [
    ((2, 8, 8, 64), 32, 0.2),    # JointCNN stage-1 shape family
    ((3, 4, 4, 128), 32, 0.2),
    ((2, 16, 256), 32, 0.0),     # pre-flattened [B, L, C], ReLU
    ((2, 8, 8, 8), 4, 0.2),      # tiny channel count
])
def test_forward_matches_flax(shape, groups, slope):
    x, scale, bias = make_inputs(jax.random.key(0), shape)
    got = group_norm_act(x, scale, bias, groups=groups,
                         negative_slope=slope)
    want = flax_gn_act(x, scale, bias, groups, slope)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_forward_bf16_close_to_f32_reference():
    x, scale, bias = make_inputs(jax.random.key(1), (2, 8, 8, 64))
    got = group_norm_act(x.astype(jnp.bfloat16), scale, bias, groups=32,
                         negative_slope=0.2)
    assert got.dtype == jnp.bfloat16
    want = flax_gn_act(x, scale, bias, 32, 0.2)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want), rtol=0.05, atol=0.05)


def test_first_order_grads_match_flax():
    x, scale, bias = make_inputs(jax.random.key(2), (2, 6, 6, 64))

    def loss_fused(x, s, b):
        return jnp.sum(jnp.sin(group_norm_act(x, s, b, groups=32,
                                              negative_slope=0.2)))

    def loss_flax(x, s, b):
        return jnp.sum(jnp.sin(flax_gn_act(x, s, b, 32, 0.2)))

    got = jax.grad(loss_fused, argnums=(0, 1, 2))(x, scale, bias)
    want = jax.grad(loss_flax, argnums=(0, 1, 2))(x, scale, bias)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=5e-4, atol=1e-5)


def test_gradient_penalty_second_order_matches_flax():
    """Mixed ∂/∂scale of ‖∂/∂x‖² — the gradient-penalty derivative shape."""
    x, scale, bias = make_inputs(jax.random.key(3), (2, 4, 4, 64))

    def make_gp(norm_fn):
        def gp(s):
            def inner(xi):
                return jnp.sum(norm_fn(xi, s, bias) ** 2)
            g = jax.grad(inner)(x)
            norms = jnp.sqrt(jnp.sum(g.reshape(g.shape[0], -1) ** 2,
                                     axis=1) + 1e-12)
            return jnp.mean((norms - 1.0) ** 2)
        return gp

    fused = make_gp(lambda xi, s, b: group_norm_act(
        xi, s, b, groups=32, negative_slope=0.2))
    flax_fn = make_gp(lambda xi, s, b: flax_gn_act(xi, s, b, 32, 0.2))
    got_v, got_g = jax.value_and_grad(fused)(scale)
    want_v, want_g = jax.value_and_grad(flax_fn)(scale)
    np.testing.assert_allclose(float(got_v), float(want_v), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got_g), np.asarray(want_g),
                               rtol=1e-3, atol=1e-6)


def test_reference_bwd_matches_autodiff_of_reference_fwd():
    """The hand-derived backward (the Pallas bwd kernel's spec) must equal
    autodiff of the forward reference."""
    x, scale, bias = make_inputs(jax.random.key(4), (3, 5, 5, 32))
    x3 = x.reshape(3, 25, 32)
    dy = jax.random.normal(jax.random.key(5), x3.shape)

    y, mean, rstd = _reference_fwd(x3, scale, bias, 8, 0.2, 1e-6)
    got = _reference_bwd(x3, scale, bias, mean, rstd, dy, 8, 0.2)

    def fwd_only(x3, s, b):
        return _reference_fwd(x3, s, b, 8, 0.2, 1e-6)[0]

    _, vjp = jax.vjp(fwd_only, x3, scale, bias)
    want = vjp(dy)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=2e-4, atol=1e-6)


def test_large_slice_falls_back_to_xla():
    # > _MAX_SLICE_BYTES per-example slice: must still compute correctly.
    x, scale, bias = make_inputs(jax.random.key(6), (1, 256, 96, 256))
    got = group_norm_act(x, scale, bias, groups=32, negative_slope=0.2)
    want = flax_gn_act(x, scale, bias, 32, 0.2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_crowd_gan_step_trains_with_pallas_norm(tmp_path):
    """Full fused SR-GAN step (incl. the gradient penalty's second-order
    path) through the Pallas norm: the custom_vjp expansion must leave a
    graph the outer parameter-grad can differentiate."""
    from srgan_tpu.apps.crowd import CrowdExperiment
    from srgan_tpu.settings import Settings

    settings = Settings(
        trial_name="pallasnorm", logs_directory=str(tmp_path / "logs"),
        batch_size=8, steps_to_run=3, summary_step_period=2,
        labeled_dataset_size=6, unlabeled_dataset_size=8,
        validation_dataset_size=3, crowd_image_height=80,
        crowd_image_width=96, image_patch_size=32, crowd_sigma=3.0,
        model_base_width=8, latent_dimension=16,
        compute_dtype="bfloat16", norm_impl="pallas")
    exp = CrowdExperiment(settings)
    state = exp.train()
    assert int(jax.device_get(state.step)) == 3
    assert np.isfinite(exp.evaluate()["MAE"])


def test_pallas_vs_xla_norm_same_training_trajectory(tmp_path):
    """Same seed, both norm impls: per-step losses must agree to fp noise
    (the kernel is a numerics-preserving swap, not a different model)."""
    from srgan_tpu.apps.age import AgeExperiment
    from srgan_tpu.settings import Settings

    def run(impl):
        settings = Settings(
            trial_name=f"norm_{impl}",
            logs_directory=str(tmp_path / f"logs_{impl}"),
            batch_size=8, steps_to_run=4, summary_step_period=1,
            labeled_dataset_size=8, unlabeled_dataset_size=8,
            validation_dataset_size=4, age_image_size=32,
            model_base_width=8, latent_dimension=16, seed=3,
            norm_impl=impl)
        exp = AgeExperiment(settings)
        exp.train()
        return exp.evaluate()["MAE"]

    mae_xla = run("xla")
    mae_pallas = run("pallas")
    np.testing.assert_allclose(mae_pallas, mae_xla, rtol=2e-3, atol=2e-3)


def test_module_in_training_step_under_jit():
    """FusedGroupNormAct inside a jitted value_and_grad step trains."""
    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.Conv(64, (3, 3), dtype=jnp.float32)(x)
            x = FusedGroupNormAct(num_groups=32, negative_slope=0.2)(x)
            return jnp.mean(x)

    model = Tiny()
    x = jax.random.normal(jax.random.key(7), (2, 8, 8, 3))
    params = model.init(jax.random.key(8), x)

    @jax.jit
    def step(p, x):
        return jax.value_and_grad(lambda p: model.apply(p, x))(p)

    val, grads = step(params, x)
    assert np.isfinite(float(val))
    flat = jax.tree.leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in flat)


def test_odd_large_hw_falls_back_to_xla():
    """hw > 2*_CHUNK_MAX with no 16-aligned divisor (e.g. 51*51=2601):
    no safe row chunking exists, so the wrapper must route to the XLA
    reference path instead of compiling a whole-slice kernel."""
    from srgan_tpu.ops.fused_norm import _pick_chunk

    assert _pick_chunk(2601) is None
    x, scale, bias = make_inputs(jax.random.key(9), (1, 51, 51, 256))
    got = group_norm_act(x, scale, bias, groups=32, negative_slope=0.2)
    want = flax_gn_act(x, scale, bias, 32, 0.2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
