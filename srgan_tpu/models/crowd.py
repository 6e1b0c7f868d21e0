"""Crowd-counting models: two-head JointCNN and the patch DCGenerator.

Reference: crowd/models.py (JointCNN, DCGenerator) [A][H] — a conv net over
image patches with two heads, a predicted **density map** and a **count
map** (count = sum over the map), used both as the SR-GAN discriminator D
and as the supervised DNN baseline; plus a DCGAN generator emitting image
patches (SURVEY.md §2 5c).

TPU-first notes: stride-2 convs (instead of pooling) keep everything as
MXU-tileable matmuls; widths are multiples of 64; GroupNorm (per-example)
keeps the gradient-penalty double differentiation clean (see dcgan.py).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from srgan_tpu.models.dcgan import DCGANGenerator, norm_act


def _conv_stage(x: jax.Array, width: int, *, stride: int, dtype,
                use_norm: bool, norm_impl: str) -> jax.Array:
    """One crowd-model stage: 3×3 conv [+ GroupNorm] + LeakyReLU(0.2).

    Shared by all crowd D/DNN variants so norm/activation policy changes
    cannot drift between them (must run inside an ``nn.compact`` call —
    submodules are created in the caller's module context).
    """
    x = nn.Conv(width, (3, 3), strides=(stride, stride), padding="SAME",
                dtype=dtype)(x)
    if use_norm:
        return norm_act(x, width, dtype, norm_impl, negative_slope=0.2)
    return nn.leaky_relu(x, 0.2)


def _joint_heads(head_input: jax.Array, trunk: jax.Array, dtype, *,
                 zero_init: bool = True, density_bias: float = 0.0,
                 count_bias: float = 0.0
                 ) -> Tuple[Tuple[jax.Array, jax.Array], jax.Array]:
    """The two 1×1-conv heads + globally pooled trunk features shared by
    every crowd variant (density map, count map, features).

    ``zero_init`` zero-initializes the head kernels and sets the biases to
    the given per-cell targets, so the step-0 prediction is exactly the
    dataset-mean map/count instead of a random O(channels·cells) sum. The
    default-init count head at 224px sums ~3k random cells, and the model
    spends thousands of steps regressing that bias before any fidelity
    signal is measurable (BASELINE.md "2000 steps is noise" negative);
    zero-init is the standard counting-network fix. Nothing in the
    reference's reconstruction (crowd/models.py [H]) specifies head init;
    the reference default is mirrored by ``Settings.zero_init_heads=False``.
    The GAN path is unaffected: features (and the gradient penalty, which
    differentiates the feature-contrasting loss) come from the trunk, not
    the heads.
    """
    kernel_init = (nn.initializers.zeros if zero_init
                   else nn.linear.default_kernel_init)
    density = nn.Conv(
        1, (1, 1), dtype=dtype, kernel_init=kernel_init,
        bias_init=nn.initializers.constant(density_bias),
        name="density_head")(head_input).squeeze(-1)
    count = nn.Conv(
        1, (1, 1), dtype=dtype, kernel_init=kernel_init,
        bias_init=nn.initializers.constant(count_bias),
        name="count_head")(head_input).squeeze(-1)
    features = jnp.mean(trunk, axis=(1, 2))
    return ((density.astype(jnp.float32), count.astype(jnp.float32)),
            features.astype(jnp.float32))


class JointCNN(nn.Module):
    """Patch → (density map, count map) + features.

    The density head regresses the per-pixel Gaussian density label at 1/4
    resolution; the count head regresses a coarse count map whose sum is the
    patch count. ``prediction`` is the pair ``(density_map, count_map)``;
    `features` is the globally-pooled penultimate activation map.
    """
    base_width: int = 64
    dtype: jnp.dtype = jnp.float32
    norm_impl: str = "xla"  # see dcgan.norm_act(): xla | fast | pallas
    # Measured (docs/design.md §7): WITHOUT norms the supervised DNN path
    # is markedly better (synthetic count MAE 0.39 vs 1.40) and ~19%
    # faster, but the ADVERSARIAL D diverges on counts (17.7 vs 2.42) —
    # the GAN streams need the normalization. Default keeps norms for the
    # reference's D==DNN architecture symmetry; flip per-use in round 2 if
    # the D/DNN symmetry is relaxed.
    use_norm: bool = True
    # Head init (see _joint_heads): zero kernels + dataset-mean biases so
    # step-0 predictions match the dataset mean instead of a huge random
    # summed bias. Biases are per-CELL targets at 1/4 map resolution.
    zero_init_heads: bool = True
    density_head_bias: float = 0.0
    count_head_bias: float = 0.0

    @nn.compact
    def __call__(self, patches: jax.Array
                 ) -> Tuple[Tuple[jax.Array, jax.Array], jax.Array]:
        x = patches.astype(self.dtype)
        w = self.base_width
        stage = functools.partial(
            _conv_stage, dtype=self.dtype, use_norm=self.use_norm,
            norm_impl=self.norm_impl)
        # Stage 1+2: /4 spatial, growing width; trunk at 1/4 resolution.
        for width in (w, 2 * w):
            x = stage(x, width, stride=2)
        for width in (4 * w, 4 * w):
            x = stage(x, width, stride=1)
        # Heads (1×1 convs → maps at 1/4 input resolution) + [B, 4w] pool.
        return _joint_heads(x, x, self.dtype,
                            zero_init=self.zero_init_heads,
                            density_bias=self.density_head_bias,
                            count_bias=self.count_head_bias)


class JointDCNN(nn.Module):
    """Deeper two-head crowd network (the reference's deeper variant).

    Reference: crowd/models.py (JointDCNN) [L] — SURVEY.md §2 5c lists a
    deeper DCGAN-mirror variant of JointCNN; the exact depth/widths are
    provisional reconstructions. Same contract as :class:`JointCNN`
    (density + count heads at 1/4 input resolution, pooled trunk
    features) with a doubled trunk and a wider final stage — widths stay
    multiples of 64 so the im2col'd matmuls tile the MXU.
    """
    base_width: int = 64
    dtype: jnp.dtype = jnp.float32
    norm_impl: str = "xla"
    use_norm: bool = True
    zero_init_heads: bool = True
    density_head_bias: float = 0.0
    count_head_bias: float = 0.0

    @nn.compact
    def __call__(self, patches: jax.Array
                 ) -> Tuple[Tuple[jax.Array, jax.Array], jax.Array]:
        x = patches.astype(self.dtype)
        w = self.base_width
        stage = functools.partial(
            _conv_stage, dtype=self.dtype, use_norm=self.use_norm,
            norm_impl=self.norm_impl)
        for width in (w, 2 * w):
            x = stage(x, width, stride=2)
        # Deep trunk at 1/4 resolution (twice JointCNN's depth, ending
        # wider).
        for width in (4 * w, 4 * w, 4 * w, 8 * w):
            x = stage(x, width, stride=1)
        return _joint_heads(x, x, self.dtype,
                            zero_init=self.zero_init_heads,
                            density_bias=self.density_head_bias,
                            count_bias=self.count_head_bias)


class SpatialPyramidCNN(nn.Module):
    """JointCNN trunk + spatial-pyramid context before the heads.

    Reference: crowd/models.py spatial-pyramid heads [L] — SURVEY.md §2
    5c; structure provisional. Global context at pyramid scales {1, 2, 4}
    is average-pooled, projected, nearest-upsampled back to the map
    resolution, and concatenated with the trunk before the two heads —
    pooling/upsampling via reshape-mean/repeat (static shapes, no
    gather), which XLA fuses cleanly on TPU.
    """
    base_width: int = 64
    dtype: jnp.dtype = jnp.float32
    norm_impl: str = "xla"
    use_norm: bool = True
    zero_init_heads: bool = True
    density_head_bias: float = 0.0
    count_head_bias: float = 0.0
    pyramid_levels: Tuple[int, ...] = (1, 2, 4)

    @nn.compact
    def __call__(self, patches: jax.Array
                 ) -> Tuple[Tuple[jax.Array, jax.Array], jax.Array]:
        x = patches.astype(self.dtype)
        w = self.base_width
        stage = functools.partial(
            _conv_stage, dtype=self.dtype, use_norm=self.use_norm,
            norm_impl=self.norm_impl)
        for width in (w, 2 * w):
            x = stage(x, width, stride=2)
        for width in (4 * w, 4 * w):
            x = stage(x, width, stride=1)
        trunk = x
        b, h, wd, c = trunk.shape
        context = [trunk]
        for level in self.pyramid_levels:
            if h % level or wd % level:
                continue  # patch size not divisible; skip this scale
            pooled = trunk.reshape(b, level, h // level, level,
                                   wd // level, c).mean(axis=(2, 4))
            proj = nn.Conv(c // len(self.pyramid_levels), (1, 1),
                           dtype=self.dtype,
                           name=f"pyramid_{level}")(pooled)
            up = jnp.repeat(jnp.repeat(proj, h // level, axis=1),
                            wd // level, axis=2)
            context.append(up)
        fused = jnp.concatenate(context, axis=-1)
        return _joint_heads(fused, trunk, self.dtype,
                            zero_init=self.zero_init_heads,
                            density_bias=self.density_head_bias,
                            count_bias=self.count_head_bias)


CROWD_MODELS = {
    "jointcnn": JointCNN,
    "jointdcnn": JointDCNN,
    "pyramid": SpatialPyramidCNN,
}


class CrowdDCGenerator(DCGANGenerator):
    """DCGAN generator emitting crowd image patches.

    Reference: crowd/models.py (DCGenerator) [A][H]. Same architecture as
    the age generator, parameterized to the crowd patch size.
    """
    image_size: int = 64
    channels: int = 3
