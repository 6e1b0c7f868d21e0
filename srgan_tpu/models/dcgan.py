"""DCGAN-style generator and convolutional regressor (age / driving apps).

Reference: age/models.py (Generator, age DCNN) [A][H] and driving/models.py
[A][M] — DCGAN transposed-conv generator (z → image) and a conv regressor
with the feature side-channel (SURVEY.md §2 5b/5d).

TPU-first design notes:
* NHWC layout (flax default) — XLA:TPU's preferred conv layout; channel
  counts are multiples of 64/128 so the im2col'd matmuls tile the 128×128 MXU.
* ``lax.conv_transpose`` / ``conv_general_dilated`` replace cuDNN
  (SURVEY.md §2 native-component checklist (a)).
* GroupNorm instead of BatchNorm: batch statistics inside the
  gradient-penalty branch would need the reference's BN-freeze trick
  (SURVEY.md §7 hard part (a)); GroupNorm is per-example, so the penalty's
  double differentiation is clean and batch-size independent — this also
  removes a cross-device BN-stats sync under data parallelism.
* ``dtype`` casts compute to bf16 for MXU throughput; params stay fp32.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


class FastGroupNorm(nn.Module):
    """GroupNorm with statistics in the COMPUTE dtype (bf16), not f32.

    MEASURED SLOWER than flax GroupNorm on v5e (693 vs 769 img/s on the
    crowd step at bf16): the norm cost is the reduction work itself, not
    the f32 stat promotion (the converts fuse into the reductions), and
    this two-pass centered-variance form loses to flax's single-pass fast
    variance. Round 2 built the fused Pallas norm kernel
    (ops/fused_norm.py, ``Settings.norm_impl="pallas"``) and measured
    flax/XLA's GroupNorm already bandwidth-bound (docs/design.md §7);
    this variant stays selectable via ``norm_impl="fast"`` for A/B.
    """
    num_groups: int = 32
    epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        groups = min(self.num_groups, c)
        while c % groups:
            groups -= 1
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        orig_shape = x.shape
        xg = x.astype(self.dtype).reshape(
            x.shape[0], -1, groups, c // groups)
        mean = jnp.mean(xg, axis=(1, 3), keepdims=True)
        centered = xg - mean
        var = jnp.mean(jnp.square(centered), axis=(1, 3), keepdims=True)
        y = centered * jax.lax.rsqrt(var + jnp.asarray(self.epsilon,
                                                       self.dtype))
        y = y.reshape(orig_shape)
        return y * scale.astype(self.dtype) + bias.astype(self.dtype)


def group_norm(width: int, dtype, fast: bool, max_groups: int = 32):
    """The model-wide norm-layer factory: flax GroupNorm (f32 statistics)
    or FastGroupNorm (compute-dtype statistics)."""
    if fast:
        return FastGroupNorm(num_groups=min(max_groups, width), dtype=dtype)
    return nn.GroupNorm(num_groups=min(max_groups, width), dtype=dtype)


def norm_act(x: jax.Array, width: int, dtype, impl: str,
             negative_slope: float = 0.0, max_groups: int = 32
             ) -> jax.Array:
    """GroupNorm + activation with a selectable implementation.

    * ``"pallas"`` — the fused single-pass Pallas kernel
      (ops/fused_norm.py): statistics + normalize + scale/shift +
      LeakyReLU in one VMEM-resident pass, Pallas backward, XLA
      second-order fallback for the gradient-penalty path.
    * ``"xla"`` — flax GroupNorm (f32 statistics) + leaky_relu.
    * ``"fast"`` — FastGroupNorm (compute-dtype statistics) + leaky_relu;
      measured slower on v5e (docs/design.md §7), kept for A/B.

    ``negative_slope=0`` is ReLU.
    """
    if impl == "pallas":
        from srgan_tpu.ops.fused_norm import FusedGroupNormAct
        return FusedGroupNormAct(num_groups=min(max_groups, width),
                                 negative_slope=negative_slope)(x)
    if impl not in ("xla", "fast"):
        raise ValueError(f"unknown norm_impl {impl!r}; "
                         f"choose from ['xla', 'fast', 'pallas']")
    x = group_norm(width, dtype, impl == "fast", max_groups)(x)
    return (nn.leaky_relu(x, negative_slope) if negative_slope
            else nn.relu(x))


class DCGANGenerator(nn.Module):
    """z → image, via a stack of stride-2 transposed convolutions.

    Output is ``tanh``-bounded to [-1, 1] (matches the reference's
    normalized-image convention, SURVEY.md §2 6c).
    """
    image_size: int = 64
    channels: int = 3
    base_width: int = 64          # width at the last (largest) deconv
    latent_dimension: int = 100
    dtype: jnp.dtype = jnp.float32
    norm_impl: str = "xla"        # see norm_act(): xla | fast | pallas

    @nn.compact
    def __call__(self, z: jax.Array) -> jax.Array:
        assert self.image_size % 8 == 0, "image_size must be divisible by 8"
        # Prefer a seed size that reaches image_size exactly by doubling
        # (224 = 7·2⁵, 96 = 6·2⁴, 64 = 4·2⁴): no wasted deconv FLOPs. If
        # the odd factor exceeds 8, fall back to the next power-of-two and
        # center-crop after the last deconv.
        start = self.image_size
        num_ups = 0
        while start % 2 == 0 and start > 7:
            start //= 2
            num_ups += 1
        if start > 7:  # odd factor too large; power-of-two fallback
            start = 4
            num_ups = 0
            size = start
            while size < self.image_size:
                size *= 2
                num_ups += 1
        else:
            size = start * (2 ** num_ups)
        x = z.astype(self.dtype)
        width = self.base_width * (2 ** (num_ups - 1))
        x = nn.Dense(start * start * width, dtype=self.dtype)(x)
        x = x.reshape(x.shape[0], start, start, width)
        x = norm_act(x, width, self.dtype, self.norm_impl)
        for i in range(num_ups):
            out_width = (self.base_width * (2 ** (num_ups - 2 - i))
                         if i < num_ups - 1 else self.channels)
            x = nn.ConvTranspose(out_width, (4, 4), strides=(2, 2),
                                 padding="SAME", dtype=self.dtype)(x)
            if i < num_ups - 1:
                x = norm_act(x, out_width, self.dtype, self.norm_impl)
        # Deconv doubling reaches the next power-of-two×4; center-crop to
        # non-power-of-two targets (e.g. 224-px crowd patches).
        if size != self.image_size:
            margin = (size - self.image_size) // 2
            x = x[:, margin:margin + self.image_size,
                  margin:margin + self.image_size, :]
        return jnp.tanh(x).astype(jnp.float32)


class ConvRegressor(nn.Module):
    """Image → scalar regression (age / steering angle), DCGAN-mirror conv
    stack, with the penultimate dense activations as `features`.

    Reference: age/models.py conv regressor [A][H]; used both as the SR-GAN
    discriminator D and as the supervised DNN baseline (SURVEY.md §2 comp 8).
    """
    base_width: int = 64
    widths: Sequence[int] = None          # override per-stage widths
    feature_size: int = 1024
    output_size: int = 1
    dtype: jnp.dtype = jnp.float32
    norm_impl: str = "xla"

    @nn.compact
    def __call__(self, images: jax.Array
                 ) -> Tuple[jax.Array, jax.Array]:
        x = images.astype(self.dtype)
        widths = self.widths
        if widths is None:
            n_down = 0
            size = x.shape[1]
            while size > 4:
                size //= 2
                n_down += 1
            widths = [self.base_width * (2 ** min(i, 3))
                      for i in range(n_down)]
        for width in widths:
            x = nn.Conv(width, (4, 4), strides=(2, 2), padding="SAME",
                        dtype=self.dtype)(x)
            x = norm_act(x, width, self.dtype, self.norm_impl,
                         negative_slope=0.2)
        x = x.reshape(x.shape[0], -1)
        features = nn.leaky_relu(
            nn.Dense(self.feature_size, dtype=self.dtype)(x), 0.2)
        prediction = nn.Dense(self.output_size, dtype=self.dtype)(features)
        if self.output_size == 1:
            prediction = prediction.squeeze(-1)
        return prediction.astype(jnp.float32), features.astype(jnp.float32)
