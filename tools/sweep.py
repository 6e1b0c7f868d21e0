#!/usr/bin/env python
"""Semi-supervised regime sweep on the coefficient toy.

Goal (VERDICT round-1 item 1): find and pin a regime where SR-GAN's
discriminator beats the supervised DNN baseline at equal labels — the
capability that names the project (reference: srgan.py three-stream
objective, SURVEY.md §2 component 3 / §6 north star).

TPU-native sweep harness: instead of launching one Experiment process per
configuration, the ENTIRE grid of (hyperparameter combo × seed) runs trains
as ONE jitted program — each run is a lane of a ``jax.vmap`` over a
``lax.scan`` training loop. Loss multipliers and the learning rate enter as
*traced* per-lane scalars, so the grid shares a single compilation, and the
MXU/VPU see one big batched program instead of hundreds of tiny ones.

The per-step math mirrors srgan_tpu/train.py's fused step (same losses.py
functions, same 4B-concat D forward, same Adam); winners found here are
re-validated through the real ``CoefficientExperiment`` by
tests/test_semi_supervised_win.py so the search tool can never drift from
the shipped trainer unnoticed.

Usage:
    python tools/sweep.py --labeled-sizes 8 16 32 --seeds 5 --steps 3000 \
        --out sweep_results.json
"""

from __future__ import annotations

import argparse
import itertools
import json
import os
import sys
from typing import NamedTuple

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax


def _force_cpu() -> None:
    # The ambient env pins JAX_PLATFORMS=axon (one remote v5e chip with
    # ~2.5-min compiles); the sweep is a tiny-MLP program that the host CPU
    # runs in seconds. Must happen before any backend initializes.
    jax.config.update("jax_platforms", "cpu")


class HP(NamedTuple):
    """Per-lane traced hyperparameters (one scalar per sweep lane)."""
    unlabeled_loss_multiplier: jax.Array
    fake_loss_multiplier: jax.Array
    gradient_penalty_multiplier: jax.Array
    learning_rate: jax.Array


class LaneState(NamedTuple):
    d_params: object
    d_opt: object
    g_params: object
    g_opt: object
    dnn_params: object
    dnn_opt: object


def build_sweep(labeled_size: int, unlabeled_size: int, batch_size: int,
                steps: int, hidden_size: int, latent_dimension: int,
                mean_offset: float = 0.0,
                adam_b1: float = 0.9, adam_b2: float = 0.999):
    """Build the jitted (lanes → final-validation-MAEs) sweep program."""
    import jax.numpy as jnp
    import optax

    from srgan_tpu import losses
    from srgan_tpu.data.coefficient import OBSERVATION_COUNT
    from srgan_tpu.models.mlp import CoefficientGenerator, CoefficientMLP
    from srgan_tpu.utils.mixture import sample_offset_normal

    discriminator = CoefficientMLP(hidden_size=hidden_size)
    generator = CoefficientGenerator(observation_count=OBSERVATION_COUNT,
                                     hidden_size=hidden_size)
    dnn = CoefficientMLP(hidden_size=hidden_size)
    # Adam with the lr applied manually so it can be a traced per-lane
    # scalar (optax.adam bakes lr into the chain as a Python constant).
    tx = optax.scale_by_adam(b1=adam_b1, b2=adam_b2)

    def init_lane(key: jax.Array) -> LaneState:
        k_d, k_g, k_dnn = jax.random.split(key, 3)
        obs = jnp.zeros((1, OBSERVATION_COUNT), jnp.float32)
        z = jnp.zeros((1, latent_dimension), jnp.float32)
        d_params = discriminator.init(k_d, obs)
        g_params = generator.init(k_g, z)
        dnn_params = dnn.init(k_dnn, obs)
        return LaneState(d_params, tx.init(d_params),
                         g_params, tx.init(g_params),
                         dnn_params, tx.init(dnn_params))

    def adam_update(grads, opt_state, params, lr):
        updates, opt_state = tx.update(grads, opt_state, params)
        updates = jax.tree.map(lambda u: -lr * u, updates)
        return optax.apply_updates(params, updates), opt_state

    def d_loss(d_params, g_params, lab_x, lab_y, unl_x, z, alpha, hp: HP):
        # Mirrors train.py's fused 4B d_loss (labeled‖unlabeled‖fake‖interp
        # in one forward; GP via grad-inside-grad) with traced multipliers.
        fake = jax.lax.stop_gradient(generator.apply(g_params, z))
        interp = losses.interpolate_inputs(alpha, unl_x, fake)
        b = lab_x.shape[0]

        def inner(x_i):
            stacked = jnp.concatenate([lab_x, unl_x, fake, x_i], axis=0)
            preds, feats = discriminator.apply(d_params, stacked)
            pred_l = preds[:b]
            f_l, f_u = feats[:b], feats[b:2 * b]
            f_f, f_i = feats[2 * b:3 * b], feats[3 * b:]
            l_loss = losses.labeled_loss(pred_l, lab_y, order=2.0)
            u_loss = losses.unlabeled_loss(
                f_l, f_u, multiplier=hp.unlabeled_loss_multiplier, order=2.0)
            f_loss = losses.fake_loss(
                f_u, f_f, multiplier=hp.fake_loss_multiplier, order=1.0)
            i_loss = losses.fake_loss(
                jax.lax.stop_gradient(f_u), f_i,
                multiplier=hp.fake_loss_multiplier, order=1.0)
            return i_loss, (l_loss, u_loss, f_loss)

        interp_grads, (l_loss, u_loss, f_loss) = jax.grad(
            inner, has_aux=True)(interp)
        gp = losses.gradient_penalty(
            interp_grads, multiplier=hp.gradient_penalty_multiplier)
        return l_loss + u_loss + f_loss + gp

    def g_loss(g_params, d_params, unl_x, z):
        fake = generator.apply(g_params, z)
        b = unl_x.shape[0]
        _, feats = discriminator.apply(
            d_params, jnp.concatenate([unl_x, fake], axis=0))
        return losses.generator_loss(
            jax.lax.stop_gradient(feats[:b]), feats[b:], order=2.0)

    def dnn_loss(dnn_params, lab_x, lab_y):
        pred, _ = dnn.apply(dnn_params, lab_x)
        return losses.labeled_loss(pred, lab_y, order=2.0)

    def train_one(hp: HP, lab_x_full, lab_y_full, unl_x_full, lane_key):
        init_key, loop_key = jax.random.split(lane_key)
        state = init_lane(init_key)

        def step(state: LaneState, step_idx):
            key = jax.random.fold_in(loop_key, step_idx)
            k_li, k_ui, k_zd, k_zg, k_a = jax.random.split(key, 5)
            # Sampling WITH replacement both streams: matches the shipped
            # pipeline's small-labeled-set behavior (data/core.py
            # epoch_batches replacement branch) and keeps shapes static.
            lab_idx = jax.random.randint(k_li, (batch_size,), 0,
                                         labeled_size)
            unl_idx = jax.random.randint(k_ui, (batch_size,), 0,
                                         unlabeled_size)
            lab_x, lab_y = lab_x_full[lab_idx], lab_y_full[lab_idx]
            unl_x = unl_x_full[unl_idx]
            z_d = sample_offset_normal(k_zd, (batch_size, latent_dimension),
                                       mean_offset)
            alpha = jax.random.uniform(k_a, (batch_size,))

            d_grads = jax.grad(d_loss)(state.d_params, state.g_params,
                                       lab_x, lab_y, unl_x, z_d, alpha, hp)
            d_params, d_opt = adam_update(d_grads, state.d_opt,
                                          state.d_params, hp.learning_rate)
            z_g = sample_offset_normal(k_zg, (batch_size, latent_dimension),
                                       mean_offset)
            g_grads = jax.grad(g_loss)(state.g_params, d_params, unl_x, z_g)
            g_params, g_opt = adam_update(g_grads, state.g_opt,
                                          state.g_params, hp.learning_rate)
            dnn_grads = jax.grad(dnn_loss)(state.dnn_params, lab_x, lab_y)
            dnn_params, dnn_opt = adam_update(
                dnn_grads, state.dnn_opt, state.dnn_params, hp.learning_rate)
            return LaneState(d_params, d_opt, g_params, g_opt,
                             dnn_params, dnn_opt), None

        state, _ = jax.lax.scan(step, state, jnp.arange(steps))
        return state

    def sweep(hp: HP, lab_x, lab_y, unl_x, lane_keys, val_x, val_y):
        """[R]-lane training + final validation MAE for D and DNN."""
        states = jax.vmap(train_one)(hp, lab_x, lab_y, unl_x, lane_keys)

        def eval_lane(state: LaneState):
            d_pred, _ = discriminator.apply(state.d_params, val_x)
            dnn_pred, _ = dnn.apply(state.dnn_params, val_x)
            return (jnp.mean(jnp.abs(d_pred - val_y)),
                    jnp.mean(jnp.abs(dnn_pred - val_y)))

        return jax.vmap(eval_lane)(states)

    return jax.jit(sweep)


def run_grid(labeled_size: int, steps: int, n_seeds: int,
             unlabeled_size: int, batch_size: int, hidden_size: int,
             latent_dimension: int, grid: dict,
             mean_offset: float = 0.0) -> list:
    """Train the full (grid × seeds) lane set for one labeled size."""
    import jax.numpy as jnp

    from srgan_tpu.data.coefficient import generate_coefficient_examples

    combos = [dict(zip(grid, values))
              for values in itertools.product(*grid.values())]
    n_runs = len(combos) * n_seeds
    print(f"[labeled={labeled_size}] {len(combos)} combos x {n_seeds} seeds "
          f"= {n_runs} lanes, {steps} steps each", flush=True)

    # Per-seed datasets (same generator as coefficient_datasets), shared
    # across combos; one large shared validation set keeps eval noise low.
    seed_data = []
    for seed in range(n_seeds):
        rng = np.random.default_rng(seed)
        lab_x, lab_y = generate_coefficient_examples(labeled_size, rng)
        # The unlabeled POPULATION is offset via mean_offset (the paper's
        # distribution-shift robustness dimension; data/coefficient.py).
        unl_x, _ = generate_coefficient_examples(
            unlabeled_size, rng, mean_offset=mean_offset)
        seed_data.append((lab_x, lab_y, unl_x))
    val_rng = np.random.default_rng(10_000)
    val_x, val_y = generate_coefficient_examples(2000, val_rng)

    # Lane layout: combo-major, seed-minor.
    hp = HP(*[jnp.array([float(c[k]) for c in combos for _ in range(n_seeds)],
                        jnp.float32) for k in
              ("unlabeled_loss_multiplier", "fake_loss_multiplier",
               "gradient_penalty_multiplier", "learning_rate")])
    lab_x = jnp.array(np.stack(
        [seed_data[s][0] for _ in combos for s in range(n_seeds)]))
    lab_y = jnp.array(np.stack(
        [seed_data[s][1] for _ in combos for s in range(n_seeds)]))
    unl_x = jnp.array(np.stack(
        [seed_data[s][2] for _ in combos for s in range(n_seeds)]))
    lane_keys = jax.vmap(jax.random.key)(
        jnp.arange(n_runs, dtype=jnp.uint32))

    sweep = build_sweep(labeled_size, unlabeled_size, batch_size, steps,
                        hidden_size, latent_dimension,
                        mean_offset=mean_offset)
    d_mae, dnn_mae = jax.device_get(
        sweep(hp, lab_x, lab_y, unl_x, lane_keys,
              jnp.array(val_x), jnp.array(val_y)))

    results = []
    for i, combo in enumerate(combos):
        d = d_mae[i * n_seeds:(i + 1) * n_seeds]
        dnn = dnn_mae[i * n_seeds:(i + 1) * n_seeds]
        results.append({
            "labeled_size": labeled_size, "steps": steps,
            "mean_offset": mean_offset, **combo,
            "gan_mae_mean": float(np.mean(d)),
            "gan_mae_std": float(np.std(d)),
            "dnn_mae_mean": float(np.mean(dnn)),
            "dnn_mae_std": float(np.std(dnn)),
            "gan_wins": int(np.sum(d < dnn)), "seeds": n_seeds,
            "gan_mae_per_seed": [float(v) for v in d],
            "dnn_mae_per_seed": [float(v) for v in dnn],
        })
    return results


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    parser.add_argument("--labeled-sizes", type=int, nargs="+",
                        default=[8, 16, 32])
    parser.add_argument("--seeds", type=int, default=5)
    parser.add_argument("--steps", type=int, default=3000)
    parser.add_argument("--unlabeled-size", type=int, default=5000)
    parser.add_argument("--batch-size", type=int, default=32)
    parser.add_argument("--hidden-size", type=int, default=10)
    parser.add_argument("--latent-dimension", type=int, default=10)
    parser.add_argument("--ul", type=float, nargs="+",
                        default=[1e-2, 1e-1, 1e0, 1e1])
    parser.add_argument("--fl", type=float, nargs="+",
                        default=[1e-2, 1e-1, 1e0, 1e1])
    parser.add_argument("--gp", type=float, nargs="+", default=[1e0, 1e1])
    parser.add_argument("--lr", type=float, nargs="+", default=[1e-3, 1e-4])
    parser.add_argument("--mean-offset", type=float, default=0.0,
                        help="offset of the unlabeled population and the "
                             "z mixture (distribution-shift robustness)")
    parser.add_argument("--out", type=str, default=None)
    args = parser.parse_args(argv)

    _force_cpu()
    grid = {"unlabeled_loss_multiplier": args.ul,
            "fake_loss_multiplier": args.fl,
            "gradient_penalty_multiplier": args.gp,
            "learning_rate": args.lr}
    all_results = []
    for labeled_size in args.labeled_sizes:
        all_results.extend(run_grid(
            labeled_size, args.steps, args.seeds, args.unlabeled_size,
            args.batch_size, args.hidden_size, args.latent_dimension, grid,
            mean_offset=args.mean_offset))

    all_results.sort(key=lambda r: r["gan_mae_mean"] - r["dnn_mae_mean"])
    print(f"\n{'labeled':>7} {'ul':>8} {'fl':>8} {'gp':>6} {'lr':>8} "
          f"{'GAN mae':>9} {'DNN mae':>9} {'wins':>5}")
    for r in all_results[:25]:
        print(f"{r['labeled_size']:>7} {r['unlabeled_loss_multiplier']:>8g} "
              f"{r['fake_loss_multiplier']:>8g} "
              f"{r['gradient_penalty_multiplier']:>6g} "
              f"{r['learning_rate']:>8g} "
              f"{r['gan_mae_mean']:>6.4f}±{r['gan_mae_std']:.3f} "
              f"{r['dnn_mae_mean']:>6.4f}±{r['dnn_mae_std']:.3f} "
              f"{r['gan_wins']:>3}/{r['seeds']}")
    if args.out:
        with open(args.out, "w") as f:
            json.dump(all_results, f, indent=1)
        print(f"\nwrote {len(all_results)} rows to {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
