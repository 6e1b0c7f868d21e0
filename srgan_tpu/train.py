"""Fused SR-GAN training step.

Where the reference runs four separate eager forward passes and per-stream
``backward()`` calls per iteration (srgan.py `gan_training_step` /
`dnn_training_step`, SURVEY.md §3.2 [A][H]), this module compiles the WHOLE
optimization step — discriminator three-stream loss + WGAN-style gradient
penalty (a native ``jax.grad``-inside-``jax.grad`` double differentiation),
generator update, and the side-by-side supervised DNN baseline update — into
ONE ``jax.jit`` program over a single train-state pytree. XLA fuses the
stream math into the model matmuls/convs, schedules the D forwards
back-to-back on the MXU, and (under a sharded mesh, see parallel/mesh.py)
inserts the gradient all-reduces over ICI.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from srgan_tpu import losses
from srgan_tpu.settings import Settings
from srgan_tpu.utils.mixture import sample_offset_normal

Array = jax.Array
Params = Any
ApplyFn = Callable[..., Any]


class ModelBundle(NamedTuple):
    """The three models of one SR-GAN trial (reference: `model_setup()`).

    * ``d_apply(params, x) -> (prediction, features)``
    * ``g_apply(params, z) -> fake_examples``
    * ``dnn_apply(params, x) -> (prediction, features)`` — supervised baseline
    """
    d_apply: ApplyFn
    g_apply: ApplyFn
    dnn_apply: Optional[ApplyFn] = None


@struct.dataclass
class SRGANTrainState:
    """All learnable state of a trial as one pytree (replicated over 'data').

    Reference keeps DNN/D/G modules + three torch Adam optimizers as object
    attributes (srgan.py `prepare_optimizers` [H]); here they are one
    immutable pytree so the step is a pure function and Orbax can checkpoint
    it wholesale (SURVEY.md §5 checkpoint/resume).
    """
    step: Array
    d_params: Params
    d_opt: optax.OptState
    g_params: Params
    g_opt: optax.OptState
    dnn_params: Optional[Params] = None
    dnn_opt: Optional[optax.OptState] = None


def make_optimizer(settings: Settings, weight_decay: bool = False,
                   learning_rate=None) -> optax.GradientTransformation:
    """Adam (AdamW when decayed) mirroring `prepare_optimizers` [H].

    ``learning_rate`` overrides ``settings.learning_rate``; it may be a
    TRACED scalar when the optimizer is built inside a trace (the sweep
    harness vmaps lanes over hyperparameters — Adam's state contains no
    lr, so traced-lr optimizers share init structure with static ones).
    """
    lr = settings.learning_rate if learning_rate is None else learning_rate
    if weight_decay and settings.weight_decay > 0.0:
        tx = optax.adamw(lr, b1=settings.adam_b1, b2=settings.adam_b2,
                         weight_decay=settings.weight_decay)
    else:
        tx = optax.adam(lr, b1=settings.adam_b1, b2=settings.adam_b2)
    if settings.gradient_clip_norm > 0.0:
        # Clip BEFORE Adam (standard order); stabilizes the documented
        # diverging supervised-crowd regime at lr 1e-4 (BASELINE.md).
        tx = optax.chain(
            optax.clip_by_global_norm(settings.gradient_clip_norm), tx)
    return tx


def init_train_state(settings: Settings, d_params: Params, g_params: Params,
                     dnn_params: Optional[Params] = None) -> SRGANTrainState:
    d_tx = make_optimizer(settings, weight_decay=True)
    g_tx = make_optimizer(settings)
    dnn_tx = make_optimizer(settings, weight_decay=True)
    return SRGANTrainState(
        step=jnp.zeros((), jnp.int32),
        d_params=d_params, d_opt=d_tx.init(d_params),
        g_params=g_params, g_opt=g_tx.init(g_params),
        dnn_params=dnn_params,
        dnn_opt=dnn_tx.init(dnn_params) if dnn_params is not None else None,
    )


def default_labeled_loss_fn(settings: Settings):
    order = settings.labeled_loss_order
    return lambda predictions, labels: losses.labeled_loss(
        predictions, labels, order=order)


def make_gan_train_step(
    settings: Settings,
    models: ModelBundle,
    labeled_loss_fn: Optional[Callable[[Any, Array], Array]] = None,
    latent_shape: Optional[Tuple[int, ...]] = None,
    hyper: Optional[Dict[str, Any]] = None,
) -> Callable[[SRGANTrainState, Array, Array, Array, Array],
              Tuple[SRGANTrainState, Dict[str, Array]]]:
    """Build the fused (D + G [+ DNN]) step: one jittable pure function.

    Signature of the returned step:
    ``step(state, labeled_examples, labels, unlabeled_examples, rng_key)
    -> (new_state, metrics)``.

    Semantics follow SURVEY.md §3.2's hot-loop contract: D sees labeled /
    unlabeled / fake / interpolated batches; one optimizer step over the sum
    of the four streams; G updated every `generator_training_step_period`
    steps; the DNN baseline trained on the same labeled batch.

    ``hyper`` optionally overrides the loss multipliers / learning rate
    with (possibly TRACED) scalars — this is how `tools/sweep.py` trains
    whole hyperparameter grids through THIS step (one vmapped program,
    no reimplementation that could drift from the shipped math). Keys:
    ``unlabeled_loss_multiplier``, ``fake_loss_multiplier``,
    ``gradient_penalty_multiplier``, ``learning_rate``.
    """
    labeled_loss_fn = labeled_loss_fn or default_labeled_loss_fn(settings)
    h = {k: getattr(settings, k)
         for k in ("unlabeled_loss_multiplier", "fake_loss_multiplier",
                   "gradient_penalty_multiplier", "learning_rate")}
    if hyper:
        unknown = set(hyper) - set(h)
        if unknown:
            raise ValueError(f"unknown hyper overrides {sorted(unknown)}; "
                             f"choose from {sorted(h)}")
        h.update(hyper)
    d_tx = make_optimizer(settings, weight_decay=True,
                          learning_rate=h["learning_rate"])
    g_tx = make_optimizer(settings, learning_rate=h["learning_rate"])
    dnn_tx = make_optimizer(settings, weight_decay=True,
                            learning_rate=h["learning_rate"])
    z_dim = settings.latent_dimension
    period = settings.generator_training_step_period

    def sample_z(key: Array, batch: int) -> Array:
        shape = (batch,) + tuple(latent_shape or (z_dim,))
        return sample_offset_normal(key, shape, settings.mean_offset)

    def d_streams(d_params: Params, labeled_x: Array, unlabeled_x: Array,
                  fake: Array):
        """D forward on the three primal streams.

        When ``fuse_discriminator_streams`` is on, the three forwards run
        as ONE batched call over the concatenated 3B batch — one conv
        kernel launch sequence instead of three, better MXU occupancy at
        small per-stream batch. Mathematically identical because the
        models use per-example normalization (GroupNorm), never batch
        statistics — the property the reference's BatchNorm forced it to
        work around with freeze tricks (SURVEY.md §7 hard part (a)).

        Fusion requires equal stream batch sizes (the feature slices
        assume it); with differing labeled/unlabeled batches it silently
        falls back to per-stream forwards — still correct, just unfused.
        """
        if (settings.fuse_discriminator_streams
                and labeled_x.shape[0] == unlabeled_x.shape[0]
                and fake.shape[0] == unlabeled_x.shape[0]):
            b = labeled_x.shape[0]
            stacked = jnp.concatenate([labeled_x, unlabeled_x, fake],
                                      axis=0)
            preds, feats = models.d_apply(d_params, stacked)
            pred_l = jax.tree.map(lambda t: t[:b], preds)
            return pred_l, feats[:b], feats[b:2 * b], feats[2 * b:]
        pred_l, f_l = models.d_apply(d_params, labeled_x)
        _, f_u = models.d_apply(d_params, unlabeled_x)
        _, f_f = models.d_apply(d_params, fake)
        return pred_l, f_l, f_u, f_f

    def d_loss(d_params: Params, g_params: Params, labeled_x: Array,
               labels: Array, unlabeled_x: Array, z: Array, alpha: Array
               ) -> Tuple[Array, Dict[str, Array]]:
        fake = jax.lax.stop_gradient(models.g_apply(g_params, z))
        pred_l, f_l, f_u, f_f = d_streams(d_params, labeled_x,
                                          unlabeled_x, fake)
        l_loss = labeled_loss_fn(pred_l, labels)
        u_loss = losses.unlabeled_loss(
            f_l, f_u, multiplier=h["unlabeled_loss_multiplier"],
            order=settings.unlabeled_loss_order)
        f_loss = losses.fake_loss(
            f_u, f_f, multiplier=h["fake_loss_multiplier"],
            order=settings.fake_loss_order,
            distance_function=settings.contrasting_distance_function)
        # Gradient penalty at unlabeled↔fake interpolates: differentiate the
        # contrasting loss w.r.t. the interpolated INPUTS; the penalty itself
        # is then differentiated w.r.t. d_params by the outer jax.grad —
        # torch's create_graph=True double-backward, natively.
        interp = losses.interpolate_inputs(alpha, unlabeled_x, fake)
        f_u_const = jax.lax.stop_gradient(f_u)

        def interp_loss_fn(x: Array) -> Array:
            _, f_i = models.d_apply(d_params, x)
            return losses.fake_loss(
                f_u_const, f_i, multiplier=h["fake_loss_multiplier"],
                order=settings.fake_loss_order,
                distance_function=settings.contrasting_distance_function)

        interp_grads = jax.grad(interp_loss_fn)(interp)
        gp = losses.gradient_penalty(
            interp_grads, multiplier=h["gradient_penalty_multiplier"])
        total = l_loss + u_loss + f_loss + gp
        metrics = {"d_labeled_loss": l_loss, "d_unlabeled_loss": u_loss,
                   "d_fake_loss": f_loss, "d_gradient_penalty": gp,
                   "d_total_loss": total}
        return total, metrics

    def g_loss(g_params: Params, d_params: Params, unlabeled_x: Array,
               z: Array) -> Array:
        fake = models.g_apply(g_params, z)
        _, f_u = models.d_apply(d_params, unlabeled_x)
        _, f_f = models.d_apply(d_params, fake)
        return losses.generator_loss(jax.lax.stop_gradient(f_u), f_f,
                                     order=settings.unlabeled_loss_order)

    def dnn_loss(dnn_params: Params, labeled_x: Array, labels: Array
                 ) -> Array:
        pred, _ = models.dnn_apply(dnn_params, labeled_x)
        return labeled_loss_fn(pred, labels)

    def step(state: SRGANTrainState, labeled_x: Array, labels: Array,
             unlabeled_x: Array, key: Array
             ) -> Tuple[SRGANTrainState, Dict[str, Array]]:
        k_zd, k_zg, k_alpha = jax.random.split(key, 3)
        batch = unlabeled_x.shape[0]
        z_d = sample_z(k_zd, batch)
        alpha = jax.random.uniform(k_alpha, (batch,), dtype=jnp.float32)

        # ---- D update -----------------------------------------------------
        (_, metrics), d_grads = jax.value_and_grad(
            d_loss, has_aux=True)(state.d_params, state.g_params,
                                  labeled_x, labels, unlabeled_x, z_d, alpha)
        d_updates, d_opt = d_tx.update(d_grads, state.d_opt, state.d_params)
        d_params = optax.apply_updates(state.d_params, d_updates)

        # ---- G update (every `generator_training_step_period` steps) ------
        z_g = sample_z(k_zg, batch)

        def do_g_update(operand):
            g_params, g_opt = operand
            g_loss_value, g_grads = jax.value_and_grad(g_loss)(
                g_params, d_params, unlabeled_x, z_g)
            g_updates, g_opt = g_tx.update(g_grads, g_opt, g_params)
            return optax.apply_updates(g_params, g_updates), g_opt, \
                g_loss_value

        if period == 1:
            g_params, g_opt, g_loss_value = do_g_update(
                (state.g_params, state.g_opt))
        else:
            g_params, g_opt, g_loss_value = jax.lax.cond(
                state.step % period == 0,
                do_g_update,
                lambda operand: (operand[0], operand[1],
                                 jnp.zeros((), jnp.float32)),
                (state.g_params, state.g_opt))
        metrics["g_loss"] = g_loss_value

        # ---- DNN baseline update (side-by-side, reference §3.2) -----------
        dnn_params, dnn_opt = state.dnn_params, state.dnn_opt
        if models.dnn_apply is not None and state.dnn_params is not None:
            dnn_loss_value, dnn_grads = jax.value_and_grad(dnn_loss)(
                state.dnn_params, labeled_x, labels)
            dnn_updates, dnn_opt = dnn_tx.update(
                dnn_grads, state.dnn_opt, state.dnn_params)
            dnn_params = optax.apply_updates(state.dnn_params, dnn_updates)
            metrics["dnn_loss"] = dnn_loss_value

        new_state = state.replace(
            step=state.step + 1, d_params=d_params, d_opt=d_opt,
            g_params=g_params, g_opt=g_opt,
            dnn_params=dnn_params, dnn_opt=dnn_opt)
        return new_state, metrics

    return step


def make_dnn_train_step(
    settings: Settings,
    models: ModelBundle,
    labeled_loss_fn: Optional[Callable[[Any, Array], Array]] = None,
) -> Callable[[SRGANTrainState, Array, Array],
              Tuple[SRGANTrainState, Dict[str, Array]]]:
    """Supervised-only step for the DNN-baseline configs (e.g. 'age DNN').

    Reference: srgan.py (dnn_training_step) [A][H].
    """
    labeled_loss_fn = labeled_loss_fn or default_labeled_loss_fn(settings)
    dnn_tx = make_optimizer(settings, weight_decay=True)

    def step(state: SRGANTrainState, labeled_x: Array, labels: Array
             ) -> Tuple[SRGANTrainState, Dict[str, Array]]:
        def loss_fn(p):
            pred, _ = models.dnn_apply(p, labeled_x)
            return labeled_loss_fn(pred, labels)

        loss_value, grads = jax.value_and_grad(loss_fn)(state.dnn_params)
        updates, dnn_opt = dnn_tx.update(grads, state.dnn_opt,
                                         state.dnn_params)
        dnn_params = optax.apply_updates(state.dnn_params, updates)
        new_state = state.replace(step=state.step + 1,
                                  dnn_params=dnn_params, dnn_opt=dnn_opt)
        return new_state, {"dnn_loss": loss_value}

    return step
