"""Fused GroupNorm + activation Pallas kernels.

Round-1 profiling showed normalization costs a measured 18% of the crowd
train step (no-norm upper bound 946 img/s vs 799 shipped; docs/design.md
§7): XLA lowers each GroupNorm as a stats-reduce pass PLUS a normalize
pass — two full HBM reads of the conv output — and the backward reads
everything again for the stats recompute. These kernels do the whole
forward (statistics + normalize + scale/shift + LeakyReLU/ReLU) in ONE
VMEM-resident pass per example (1 read + 1 write), and the whole backward
(mask, dgamma/dbeta, the two per-group reductions, dx) in one pass over
(x, dy).

Differentiation contract (the part that makes this usable under the
SR-GAN gradient penalty, which needs ∂²/∂θ∂x through the discriminator):

* ``group_norm_act`` is a ``jax.custom_vjp``: first-order reverse-mode —
  the G/DNN updates and the inner grad-w.r.t.-inputs of the penalty — hits
  the Pallas backward kernel.
* Its fwd/bwd internals (``_fwd_op`` / ``_bwd_op``) are themselves
  ``jax.custom_jvp`` ops whose tangent rules are auto-derived from a pure
  jnp reference implementation. After the first reverse pass expands the
  custom_vjp, the remaining graph contains only these JVP-differentiable
  ops, so the OUTER ``jax.grad`` over the gradient-penalty term (the
  second-order path) falls back to XLA math instead of erroring the way a
  bare custom_vjp would.

Group statistics use the single-pass E[x²]−E[x]² form in f32 (matches
flax ``use_fast_variance``); per-channel sublane reductions are combined
across the group's channels with tiny one-hot matmuls on the MXU — no
cross-lane relayouts (Mosaic constraint, CLAUDE.md).

Reference context: the upstream models use BatchNorm (crowd/age models.py
[H]); this build uses GroupNorm by design (docs/design.md §2), so this
kernel IS the production norm path, not an optional extra.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

# Per-example VMEM footprint guard: a [HW, C] slice larger than this falls
# back to the XLA reference path rather than risk a Mosaic VMEM overflow.
# Budget: the bwd kernel holds 3 double-buffered slices (x, dy, dx) plus
# chunk-sized f32 temporaries in 16 MB of VMEM → ~2.4 MB/slice ceiling;
# the flagship bf16 crowd shapes (12544×64, 3136×256 → 1.6 MB) fit.
_MAX_SLICE_BYTES = int(2.4 * 1024 * 1024)

# Row-chunk ceiling for in-kernel streaming: statistics accumulate over
# [chunk, C] f32 tiles inside a fori_loop so Mosaic never materializes a
# whole-slice f32 temporary (the naive whole-slice form OOMs scoped VMEM
# at [12544, 64], and an UNROLLED chunk loop re-OOMs because stack slots
# are not reused across unrolled iterations).
_CHUNK_MAX = 1024


def _pick_chunk(hw: int) -> Optional[int]:
    """Largest sublane-aligned divisor of hw ≤ _CHUNK_MAX.

    Small slices (≤ 2·_CHUNK_MAX rows) stream as one whole chunk. Larger
    slices NEED chunking (whole-slice f32 temporaries overflow scoped
    VMEM — see _CHUNK_MAX comment); if hw has no 16-aligned divisor in
    range, returns None and the caller falls back to the XLA path.
    """
    if hw <= 2 * _CHUNK_MAX:
        return hw
    for chunk in range(_CHUNK_MAX, 0, -1):
        if hw % chunk == 0 and chunk % 16 == 0:
            return chunk
    return None


def _group_onehot(lanes: int, groups: int, c_true: int,
                  dtype=jnp.float32) -> Array:
    """[lanes, G] one-hot group membership (M[l, g] = 1 iff lane l ∈ g).

    ``sums[1, L] @ M → [1, G]`` reduces lanes within each group and
    ``per_group[1, G] @ M.T → [1, L]`` broadcasts back — both tiny MXU
    matmuls, avoiding [1, L] → [G, L/G] cross-lane relayouts.

    When channels are FOLDED into the lane dim (lanes = fold·c_true so
    narrow-channel tensors fill all 128 lanes instead of padding 2×),
    lane l carries channel ``l % c_true``.
    """
    cg = c_true // groups
    row_group = (jax.lax.broadcasted_iota(jnp.int32, (lanes, groups), 0)
                 % c_true) // cg
    col = jax.lax.broadcasted_iota(jnp.int32, (lanes, groups), 1)
    return (row_group == col).astype(dtype)


# ---------------------------------------------------------------------------
# Pure-jnp reference (single source of truth for parity tests AND for the
# auto-derived second-order tangent rules).
# ---------------------------------------------------------------------------

def _reference_fwd(x: Array, scale: Array, bias: Array, groups: int,
                   negative_slope: float, eps: float
                   ) -> Tuple[Array, Array, Array]:
    """jnp GroupNorm+activation returning (y, group mean, group rstd).

    x: [B, HW, C]; scale/bias: [C]; mean/rstd: [B, G] (f32).
    """
    b, hw, c = x.shape
    xf = x.astype(jnp.float32).reshape(b, hw, groups, c // groups)
    mean = jnp.mean(xf, axis=(1, 3))                      # [B, G]
    sq = jnp.mean(jnp.square(xf), axis=(1, 3))
    rstd = jax.lax.rsqrt(sq - jnp.square(mean) + eps)     # [B, G]
    mean_c = jnp.repeat(mean, c // groups, axis=1)        # [B, C]
    rstd_c = jnp.repeat(rstd, c // groups, axis=1)
    y0 = ((x.astype(jnp.float32) - mean_c[:, None, :]) * rstd_c[:, None, :]
          * scale.astype(jnp.float32) + bias.astype(jnp.float32))
    y = jnp.where(y0 > 0, y0, negative_slope * y0)
    return y.astype(x.dtype), mean, rstd


def _reference_bwd(x: Array, scale: Array, bias: Array, mean: Array,
                   rstd: Array, dy: Array, groups: int,
                   negative_slope: float
                   ) -> Tuple[Array, Array, Array]:
    """jnp GroupNorm+activation backward: (dx, dscale, dbias)."""
    b, hw, c = x.shape
    cg = c // groups
    mean_c = jnp.repeat(mean, cg, axis=1)[:, None, :]     # [B, 1, C]
    rstd_c = jnp.repeat(rstd, cg, axis=1)[:, None, :]
    xf = x.astype(jnp.float32)
    xhat = (xf - mean_c) * rstd_c
    y0 = xhat * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    dy0 = dy.astype(jnp.float32) * jnp.where(y0 > 0, 1.0, negative_slope)
    dbias = jnp.sum(dy0, axis=(0, 1))
    dscale = jnp.sum(dy0 * xhat, axis=(0, 1))
    dxhat = dy0 * scale.astype(jnp.float32)
    n = hw * cg
    g1 = dxhat.reshape(b, hw, groups, cg)
    g2 = (dxhat * xhat).reshape(b, hw, groups, cg)
    m1 = jnp.repeat(jnp.sum(g1, axis=(1, 3)) / n, cg, axis=1)[:, None, :]
    m2 = jnp.repeat(jnp.sum(g2, axis=(1, 3)) / n, cg, axis=1)[:, None, :]
    dx = (rstd_c * (dxhat - m1 - xhat * m2)).astype(x.dtype)
    return dx, dscale, dbias


# ---------------------------------------------------------------------------
# Pallas kernels.
# ---------------------------------------------------------------------------

def _row_accessors(hw: int, chunk: int):
    """(read, write) helpers over the row dim of a [1, hw, c] block.

    Chunked shapes slice with a dynamic, alignment-hinted offset (the
    hint must be a true divisor of every i*chunk — the largest power of
    two dividing chunk, not chunk itself). Single-chunk shapes (hw =
    chunk, e.g. the generator's 49/196-pixel stages) use whole-ref
    access: even a constant pl.ds start defeats Mosaic's sublane
    alignment proof when chunk isn't 8-aligned.
    """
    if hw == chunk:
        return (lambda ref, i: ref[0],
                lambda ref, i, val: ref.__setitem__(0, val))
    align = min(chunk & -chunk, 256)

    def read(ref, i):
        return ref[0, pl.ds(pl.multiple_of(i * chunk, align), chunk), :]

    def write(ref, i, val):
        ref[0, pl.ds(pl.multiple_of(i * chunk, align), chunk), :] = val

    return read, write


def _fwd_kernel(x_ref, scale_ref, bias_ref, y_ref, mean_ref, rstd_ref, *,
                groups: int, c_true: int, negative_slope: float,
                eps: float):
    hw, c = x_ref.shape[1], x_ref.shape[2]  # c = fold * c_true lanes
    chunk = _pick_chunk(hw)
    read, write = _row_accessors(hw, chunk)
    onehot = _group_onehot(c, groups, c_true)               # [L, G]

    def stats_body(i, carry):
        s, q = carry
        xb = read(x_ref, i).astype(jnp.float32)
        return (s + jnp.sum(xb, axis=0, keepdims=True),
                q + jnp.sum(xb * xb, axis=0, keepdims=True))

    init = (jnp.zeros((1, c), jnp.float32), jnp.zeros((1, c), jnp.float32))
    if hw == chunk:
        ch_sum, ch_sq = stats_body(0, init)
    else:
        ch_sum, ch_sq = jax.lax.fori_loop(0, hw // chunk, stats_body, init)
    inv_n = 1.0 / (hw * (c // groups))  # hw·fold·(c_true/groups) elements
    mean = jnp.dot(ch_sum, onehot,
                   preferred_element_type=jnp.float32) * inv_n      # [1, G]
    sq = jnp.dot(ch_sq, onehot,
                 preferred_element_type=jnp.float32) * inv_n
    rstd = jax.lax.rsqrt(sq - mean * mean + eps)
    mean_c = jnp.dot(mean, onehot.T,
                     preferred_element_type=jnp.float32)            # [1, C]
    rstd_c = jnp.dot(rstd, onehot.T,
                     preferred_element_type=jnp.float32)
    gamma = scale_ref[...].astype(jnp.float32)              # [1, C]
    beta = bias_ref[...].astype(jnp.float32)
    mul = rstd_c * gamma

    def write_body(i, _):
        xb = read(x_ref, i).astype(jnp.float32)
        y0 = (xb - mean_c) * mul + beta
        y = jnp.where(y0 > 0, y0, negative_slope * y0)
        write(y_ref, i, y.astype(y_ref.dtype))
        return 0

    if hw == chunk:
        write_body(0, 0)
    else:
        jax.lax.fori_loop(0, hw // chunk, write_body, 0)
    mean_ref[0] = mean
    rstd_ref[0] = rstd


def _bwd_kernel(x_ref, scale_ref, bias_ref, mean_ref, rstd_ref, dy_ref,
                dx_ref, dscale_ref, dbias_ref, *,
                groups: int, c_true: int, negative_slope: float):
    hw, c = x_ref.shape[1], x_ref.shape[2]  # c = fold * c_true lanes
    onehot = _group_onehot(c, groups, c_true)
    gamma = scale_ref[...].astype(jnp.float32)              # [1, C]
    beta = bias_ref[...].astype(jnp.float32)
    mean_c = jnp.dot(mean_ref[0], onehot.T,
                     preferred_element_type=jnp.float32)    # [1, C]
    rstd_c = jnp.dot(rstd_ref[0], onehot.T,
                     preferred_element_type=jnp.float32)

    chunk = _pick_chunk(hw)
    read, write = _row_accessors(hw, chunk)

    def chunk_terms(i):
        xb = read(x_ref, i).astype(jnp.float32)
        gb = read(dy_ref, i).astype(jnp.float32)
        xhat = (xb - mean_c) * rstd_c
        y0 = xhat * gamma + beta
        dy0 = gb * jnp.where(y0 > 0, 1.0, negative_slope)
        return xhat, dy0

    def acc_body(i, carry):
        dbias_c, dscale_c, s1, s2 = carry
        xhat, dy0 = chunk_terms(i)
        dxhat = dy0 * gamma
        return (dbias_c + jnp.sum(dy0, axis=0, keepdims=True),
                dscale_c + jnp.sum(dy0 * xhat, axis=0, keepdims=True),
                s1 + jnp.sum(dxhat, axis=0, keepdims=True),
                s2 + jnp.sum(dxhat * xhat, axis=0, keepdims=True))

    zero = lambda: jnp.zeros((1, c), jnp.float32)
    init = (zero(), zero(), zero(), zero())
    if hw == chunk:  # static single-chunk path (see _fwd_kernel)
        dbias_c, dscale_c, s1, s2 = acc_body(0, init)
    else:
        dbias_c, dscale_c, s1, s2 = jax.lax.fori_loop(
            0, hw // chunk, acc_body, init)
    inv_n = 1.0 / (hw * (c // groups))
    m1 = jnp.dot(jnp.dot(s1, onehot, preferred_element_type=jnp.float32)
                 * inv_n, onehot.T, preferred_element_type=jnp.float32)
    m2 = jnp.dot(jnp.dot(s2, onehot, preferred_element_type=jnp.float32)
                 * inv_n, onehot.T, preferred_element_type=jnp.float32)

    def write_body(i, _):
        xhat, dy0 = chunk_terms(i)
        dxhat = dy0 * gamma
        write(dx_ref, i,
              (rstd_c * (dxhat - m1 - xhat * m2)).astype(dx_ref.dtype))
        return 0

    if hw == chunk:
        write_body(0, 0)
    else:
        jax.lax.fori_loop(0, hw // chunk, write_body, 0)

    # dscale/dbias accumulate across the (sequential) batch grid.
    @pl.when(pl.program_id(0) == 0)
    def _():
        dscale_ref[...] = jnp.zeros_like(dscale_ref)
        dbias_ref[...] = jnp.zeros_like(dbias_ref)

    dscale_ref[...] += dscale_c
    dbias_ref[...] += dbias_c


def _fold_factor(hw: int, c: int) -> int:
    """Pixels folded into the lane dim so narrow-channel tensors fill all
    128 lanes (c=64 would otherwise pad 2× in VMEM — the bwd kernel's
    six double-buffered [hw, c] blocks then exceed the 16 MB budget)."""
    if c < 128 and 128 % c == 0 and hw % (128 // c) == 0:
        return 128 // c
    return 1


def _pallas_fwd(x: Array, scale: Array, bias: Array, groups: int,
                negative_slope: float, eps: float, interpret: bool
                ) -> Tuple[Array, Array, Array]:
    b, hw_true, c_true = x.shape
    fold = _fold_factor(hw_true, c_true)
    hw, c = hw_true // fold, c_true * fold
    x = x.reshape(b, hw, c)  # row-major: lane l ↔ channel l % c_true
    scale = jnp.tile(scale.reshape(1, c_true), (1, fold))
    bias = jnp.tile(bias.reshape(1, c_true), (1, fold))
    kernel = functools.partial(_fwd_kernel, groups=groups, c_true=c_true,
                               negative_slope=negative_slope, eps=eps)
    y, mean, rstd = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, hw, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, hw, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            # Stats carry a dummy sublane dim ([B, 1, G]) — Mosaic requires
            # the last two block dims be (8k, 128k) or full-array-sized.
            pl.BlockSpec((1, 1, groups), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, groups), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, hw, c), x.dtype),
            jax.ShapeDtypeStruct((b, 1, groups), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, groups), jnp.float32),
        ],
        interpret=interpret,
    )(x, scale, bias)
    return (y.reshape(b, hw_true, c_true), mean.reshape(b, groups),
            rstd.reshape(b, groups))


def _pallas_bwd(x: Array, scale: Array, bias: Array, mean: Array,
                rstd: Array, dy: Array, groups: int, negative_slope: float,
                interpret: bool) -> Tuple[Array, Array, Array]:
    b, hw_true, c_true = x.shape
    fold = _fold_factor(hw_true, c_true)
    hw, c = hw_true // fold, c_true * fold
    x = x.reshape(b, hw, c)
    dy = dy.reshape(b, hw, c)
    scale = jnp.tile(scale.reshape(1, c_true), (1, fold))
    bias = jnp.tile(bias.reshape(1, c_true), (1, fold))
    kernel = functools.partial(_bwd_kernel, groups=groups, c_true=c_true,
                               negative_slope=negative_slope)
    dx, dscale, dbias = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, hw, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, groups), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, groups), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hw, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, hw, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, hw, c), x.dtype),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
        ],
        interpret=interpret,
    )(x, scale, bias,
      mean.reshape(b, 1, groups), rstd.reshape(b, 1, groups), dy)
    # Fold copies of each channel (lane l ↔ channel l % c_true) sum up.
    return (dx.reshape(b, hw_true, c_true),
            dscale.reshape(fold, c_true).sum(axis=0),
            dbias.reshape(fold, c_true).sum(axis=0))


# ---------------------------------------------------------------------------
# Differentiable wrappers.
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _make_gn_act(groups: int, negative_slope: float, eps: float,
                 interpret: bool):
    """Build the custom-AD GroupNorm+activation closure for one config."""

    @jax.custom_jvp
    def fwd_op(x, scale, bias):
        return _pallas_fwd(x, scale, bias, groups, negative_slope, eps,
                           interpret)

    @fwd_op.defjvp
    def fwd_op_jvp(primals, tangents):
        primal_out = fwd_op(*primals)
        _, tangent_out = jax.jvp(
            lambda x, s, b: _reference_fwd(x, s, b, groups, negative_slope,
                                           eps),
            primals, tangents)
        return primal_out, tangent_out

    @jax.custom_jvp
    def bwd_op(x, scale, bias, mean, rstd, dy):
        return _pallas_bwd(x, scale, bias, mean, rstd, dy, groups,
                           negative_slope, interpret)

    @bwd_op.defjvp
    def bwd_op_jvp(primals, tangents):
        primal_out = bwd_op(*primals)
        _, tangent_out = jax.jvp(
            lambda x, s, b, m, r, g: _reference_bwd(
                x, s, b, m, r, g, groups, negative_slope),
            primals, tangents)
        return primal_out, tangent_out

    @jax.custom_vjp
    def gn_act(x, scale, bias):
        return fwd_op(x, scale, bias)[0]

    def gn_act_fwd(x, scale, bias):
        y, mean, rstd = fwd_op(x, scale, bias)
        return y, (x, scale, bias, mean, rstd)

    def gn_act_bwd(residuals, dy):
        x, scale, bias, mean, rstd = residuals
        return bwd_op(x, scale, bias, mean, rstd, dy)

    gn_act.defvjp(gn_act_fwd, gn_act_bwd)
    return gn_act


def group_norm_act(x: Array, scale: Array, bias: Array, *, groups: int,
                   negative_slope: float = 0.0, eps: float = 1e-6,
                   interpret: bool | None = None) -> Array:
    """Fused GroupNorm + LeakyReLU over NHWC (or [B, L, C]) activations.

    Matches ``flax.linen.GroupNorm(num_groups=groups, epsilon=eps)``
    followed by ``leaky_relu(·, negative_slope)`` (slope 0 ≡ ReLU), with
    f32 statistics regardless of ``x.dtype``. ``interpret=None`` resolves
    to interpreter mode off-TPU (hermetic CPU tests run the same code
    path Mosaic compiles on hardware).
    """
    orig_shape = x.shape
    c = orig_shape[-1]
    if c % groups:
        raise ValueError(f"channels {c} not divisible by groups {groups}")
    x3 = x.reshape(orig_shape[0], -1, c)
    slice_bytes = x3.shape[1] * c * x3.dtype.itemsize
    hw_folded = x3.shape[1] // _fold_factor(x3.shape[1], c)
    if slice_bytes > _MAX_SLICE_BYTES or _pick_chunk(hw_folded) is None:
        # Per-example slice too large for a single-pass VMEM kernel, or
        # no sublane-aligned row chunking exists for this (odd, large)
        # shape — XLA reference path instead of a scoped-VMEM overflow.
        y, _, _ = _reference_fwd(x3, scale, bias, groups, negative_slope,
                                 eps)
        return y.reshape(orig_shape)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    fn = _make_gn_act(groups, float(negative_slope), float(eps),
                      bool(interpret))
    return fn(x3, scale, bias).reshape(orig_shape)


class FusedGroupNormAct(nn.Module):
    """flax module: Pallas-fused GroupNorm + LeakyReLU (slope 0 = ReLU).

    Drop-in for ``nn.GroupNorm(...)`` + activation; parameters are the
    same per-channel scale/bias.
    """
    num_groups: int = 32
    negative_slope: float = 0.0
    epsilon: float = 1e-6
    interpret: bool | None = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        c = x.shape[-1]
        groups = min(self.num_groups, c)
        while c % groups:
            groups -= 1
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        return group_norm_act(x, scale, bias, groups=groups,
                              negative_slope=self.negative_slope,
                              eps=self.epsilon, interpret=self.interpret)
