"""Named settings presets: the measured known-good configurations.

The reference's per-app entry scripts hard-code their trial settings in
``__main__`` blocks (SURVEY.md §1 entry layer [H]); here the recorded
configurations live as named bundles selectable with
``python -m srgan_tpu <app> --preset <name>`` (explicit ``--flag``
overrides still apply on top). Numbers and provenance: BASELINE.md.
"""

from __future__ import annotations

from typing import Dict

PRESETS: Dict[str, Dict] = {
    # The demonstrated semi-supervised win regime on the coefficient toy
    # (BASELINE.md "Semi-supervised win": GAN D beats the DNN baseline,
    # 7/10 seeds at 4000 steps, paired t ≈ -2.3 over 24 sweep seeds).
    "coefficient_win": dict(
        batch_size=32, labeled_dataset_size=16,
        unlabeled_dataset_size=5000, validation_dataset_size=2000,
        hidden_size=100, learning_rate=1e-4,
        unlabeled_loss_multiplier=0.1, fake_loss_multiplier=1.0,
        gradient_penalty_multiplier=10.0, steps_to_run=10000,
        validation_step_period=1000),
    # Few-labeled-image crowd regime (BASELINE.md: GAN count-MAE beats
    # the DNN baseline 4/6 seeds with far better worst-case).
    "crowd_fewshot": dict(
        batch_size=32, steps_to_run=3000,
        labeled_dataset_size=4, unlabeled_dataset_size=64,
        image_patch_size=64, model_base_width=32, latent_dimension=100,
        learning_rate=1e-4, unlabeled_loss_multiplier=0.1,
        fake_loss_multiplier=1.0, gradient_penalty_multiplier=10.0,
        compute_dtype="bfloat16", validation_step_period=1000),
    # The throughput flagship (bench.py's configuration: ~798 img/s on a
    # single v5e core).
    "crowd_flagship": dict(
        batch_size=120, image_patch_size=224, model_base_width=64,
        latent_dimension=100, compute_dtype="bfloat16",
        crowd_image_height=384, crowd_image_width=512),
    # Supervised-only baseline config (the reference's "age DNN" trial).
    "age_dnn": dict(dnn_only=True),
}


def apply_preset(name: str, overrides: Dict) -> Dict:
    """Merge ``overrides`` over the named preset (overrides win)."""
    try:
        base = dict(PRESETS[name])
    except KeyError:
        raise ValueError(f"unknown preset {name!r}; "
                         f"choose from {sorted(PRESETS)}") from None
    base.update(overrides)
    return base
