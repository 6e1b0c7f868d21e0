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

Each lane trains THROUGH the shipped step itself:
``srgan_tpu.train.make_gan_train_step(..., hyper=<traced scalars>)`` is
built inside the vmap, so the loss/optimizer math is the production
code, not a mirror — any change to train.py propagates here
automatically (VERDICT r2 weak #8: the old harness reimplemented the
step and every loss change had to be made twice). Only the data
sampling (with-replacement index draws inside lax.scan) is
sweep-specific. Winners are additionally re-validated through the real
``CoefficientExperiment`` by tests/test_semi_supervised_win.py.

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


def build_sweep(labeled_size: int, unlabeled_size: int, batch_size: int,
                steps: int, hidden_size: int, latent_dimension: int,
                mean_offset: float = 0.0,
                adam_b1: float = 0.9, adam_b2: float = 0.999):
    """Build the jitted (lanes → final-validation-MAEs) sweep program.

    Every lane trains through the PRODUCTION fused step
    (`make_gan_train_step`) with the lane's hyperparameters passed as
    traced scalars via its ``hyper`` argument.
    """
    import jax.numpy as jnp

    from srgan_tpu.data.coefficient import OBSERVATION_COUNT
    from srgan_tpu.models.mlp import CoefficientGenerator, CoefficientMLP
    from srgan_tpu.settings import Settings
    from srgan_tpu.train import (ModelBundle, init_train_state,
                                 make_gan_train_step)

    discriminator = CoefficientMLP(hidden_size=hidden_size)
    generator = CoefficientGenerator(observation_count=OBSERVATION_COUNT,
                                     hidden_size=hidden_size)
    dnn = CoefficientMLP(hidden_size=hidden_size)
    models = ModelBundle(d_apply=discriminator.apply,
                         g_apply=generator.apply, dnn_apply=dnn.apply)
    settings = Settings(batch_size=batch_size, hidden_size=hidden_size,
                        latent_dimension=latent_dimension,
                        mean_offset=mean_offset,
                        adam_b1=adam_b1, adam_b2=adam_b2)

    def init_lane(key: jax.Array):
        k_d, k_g, k_dnn = jax.random.split(key, 3)
        obs = jnp.zeros((1, OBSERVATION_COUNT), jnp.float32)
        z = jnp.zeros((1, latent_dimension), jnp.float32)
        # Adam state carries no lr, so the statically-built optimizer
        # templates in init_train_state match the traced-lr step exactly.
        return init_train_state(settings,
                                d_params=discriminator.init(k_d, obs),
                                g_params=generator.init(k_g, z),
                                dnn_params=dnn.init(k_dnn, obs))

    def train_one(hp: HP, lab_x_full, lab_y_full, unl_x_full, lane_key):
        init_key, loop_key = jax.random.split(lane_key)
        state = init_lane(init_key)
        # THE shipped step, with this lane's (traced) hyperparameters.
        step_fn = make_gan_train_step(settings, models,
                                      hyper=hp._asdict())

        def step(state, step_idx):
            key = jax.random.fold_in(loop_key, step_idx)
            k_li, k_ui, k_step = jax.random.split(key, 3)
            # Sampling WITH replacement both streams: matches the shipped
            # pipeline's small-labeled-set behavior (data/core.py
            # epoch_batches replacement branch) and keeps shapes static.
            lab_idx = jax.random.randint(k_li, (batch_size,), 0,
                                         labeled_size)
            unl_idx = jax.random.randint(k_ui, (batch_size,), 0,
                                         unlabeled_size)
            state, _metrics = step_fn(state, lab_x_full[lab_idx],
                                      lab_y_full[lab_idx],
                                      unl_x_full[unl_idx], k_step)
            return state, None

        state, _ = jax.lax.scan(step, state, jnp.arange(steps))
        return state

    def sweep(hp: HP, lab_x, lab_y, unl_x, lane_keys, val_x, val_y):
        """[R]-lane training + final validation MAE for D and DNN."""
        states = jax.vmap(train_one)(hp, lab_x, lab_y, unl_x, lane_keys)

        def eval_lane(state):
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
