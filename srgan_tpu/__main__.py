"""CLI entry: ``python -m srgan_tpu <app> [--setting value ...]``.

Mirrors the reference's per-app entry scripts (``<app>/srgan.py:__main__``
constructing a Settings and calling ``Experiment.train()`` — SURVEY.md §1
entry layer), with settings fields exposed as ``--flags``. Any dataclass
field of :class:`~srgan_tpu.settings.Settings` can be overridden;
values are parsed with the field's type.

Examples:
  python -m srgan_tpu coefficient --steps_to_run 2000 --learning_rate 1e-3
  python -m srgan_tpu age --dnn_only true
  python -m srgan_tpu crowd --crowd_database_path /data/ucf_qnrf_npz
"""

from __future__ import annotations

import argparse
import json
import sys
import typing

from srgan_tpu.settings import Settings

APPS = {
    "coefficient": "srgan_tpu.apps.coefficient:CoefficientExperiment",
    "age": "srgan_tpu.apps.age:AgeExperiment",
    "crowd": "srgan_tpu.apps.crowd:CrowdExperiment",
    "driving": "srgan_tpu.apps.driving:DrivingExperiment",
}


def _parse_value(raw: str, field_type):
    origin = typing.get_origin(field_type)
    if origin is typing.Union:  # Optional[T]
        args = [a for a in typing.get_args(field_type)
                if a is not type(None)]
        if raw.lower() in ("none", "null"):
            return None
        field_type = args[0]
        origin = typing.get_origin(field_type)
    if field_type is bool:
        return raw.lower() in ("1", "true", "yes", "on")
    if field_type is int:
        return int(raw)
    if field_type is float:
        return float(raw)
    if origin in (tuple, list):
        parsed = json.loads(raw)
        return tuple(parsed) if origin is tuple else list(parsed)
    return raw


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    parser = argparse.ArgumentParser(
        prog="srgan_tpu",
        description="TPU-native SR-GAN training",
        epilog=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    parser.add_argument("app", choices=sorted(APPS),
                        help="application experiment to run")
    parser.add_argument("--evaluate_only", action="store_true",
                        help="restore load_model_path and evaluate only")
    parser.add_argument("--preset", default=None,
                        help="named settings bundle (srgan_tpu.presets); "
                             "explicit --flags override preset values")
    parser.add_argument("--export_density_maps", default=None,
                        metavar="PATH.npz",
                        help="crowd only: after evaluation, write the "
                             "predicted density-map canvases of the "
                             "validation (and, if present, test) split "
                             "to an .npz (keys: validation, test, plus "
                             "*_image_ids for tiled databases)")
    args, rest = parser.parse_known_args(argv)

    overrides = []
    i = 0
    hints = typing.get_type_hints(Settings)
    while i < len(rest):
        token = rest[i]
        if not token.startswith("--"):
            raise SystemExit(f"unexpected argument {token!r}")
        name = token[2:]
        if "=" in name:
            name, raw = name.split("=", 1)
        else:
            i += 1
            if i >= len(rest):
                raise SystemExit(f"--{name} requires a value")
            raw = rest[i]
        if name not in hints:
            known = ", ".join(sorted(hints))
            raise SystemExit(f"unknown setting --{name}; known: {known}")
        overrides.append((name, _parse_value(raw, hints[name])))
        i += 1

    fields = dict(overrides)
    if args.preset:
        from srgan_tpu.presets import apply_preset
        try:
            fields = apply_preset(args.preset, fields)
        except ValueError as error:
            raise SystemExit(str(error))
    settings = Settings(**fields)
    module_name, class_name = APPS[args.app].split(":")
    import importlib
    experiment_cls = getattr(importlib.import_module(module_name),
                             class_name)
    experiment = experiment_cls(settings)
    if args.export_density_maps:
        if args.app != "crowd":
            raise SystemExit("--export_density_maps is crowd-only "
                             "(density maps are a crowd-counting "
                             "concept)")
        # Fail on an unwritable destination BEFORE the (possibly
        # hours-long) run, not at the post-training save.
        _ensure_writable(args.export_density_maps)
    if args.evaluate_only:
        if not settings.load_model_path:
            raise SystemExit("--evaluate_only requires --load_model_path")
        experiment.prepare_for_evaluation(settings.load_model_path)
        # Export FIRST: it compiles the maps grid program, which the
        # evaluate() calls below then reuse (predict_image_counts) —
        # one remote compile instead of two (review r3).
        _export_density_maps(experiment, args.export_density_maps)
        result = {"validation": _evaluate_or_null(experiment)}
        _add_test_metrics(experiment, result)
        print(json.dumps(result))
        experiment.close()  # writers + any input-pipeline threads
        return 0
    experiment.train()
    _export_density_maps(experiment, args.export_density_maps)
    result = {"trial_directory": experiment.trial_directory,
              "validation": _evaluate_or_null(experiment)}
    _add_test_metrics(experiment, result)
    print(json.dumps(result))
    experiment.close()
    return 0


def _ensure_writable(path: str) -> None:
    import os
    parent = os.path.dirname(os.path.abspath(path))
    try:
        os.makedirs(parent, exist_ok=True)
    except OSError as error:
        raise SystemExit(f"cannot write {path!r}: {error}")
    if not os.access(parent, os.W_OK):
        raise SystemExit(f"cannot write {path!r}: {parent} not writable")


def _evaluate_or_null(experiment):
    """Validation metrics, or ``null`` for an empty/absent validation
    split — a completed training run must always report its JSON (the
    empty TEST split already gets the same treatment)."""
    ds = getattr(experiment, "validation_db", None)
    if ds is None:
        ds = experiment.validation_dataset
    if ds is None or len(ds) == 0:
        return None
    return experiment.evaluate()


def _export_density_maps(experiment, path) -> None:
    """Write predicted density canvases ([N, H/4, W/4] per split) — the
    artifact crowd users consume downstream (heat maps, localization);
    the reference exposes maps only through its plotting code."""
    if not path:
        return
    import numpy as np

    arrays = {"validation": experiment.predict_density_maps()}
    if experiment.test_dataset is not None and \
            len(experiment.test_dataset) > 0:
        arrays["test"] = experiment.predict_density_maps(
            db=experiment.test_dataset)
    for split in list(arrays):
        db = (experiment.validation_db if split == "validation"
              else experiment.test_dataset)
        if getattr(db, "image_ids", None) is not None:
            # tiled databases: map each example (tile) to its source image
            arrays[f"{split}_image_ids"] = db.image_ids
    np.savez(path, **arrays)


def _add_test_metrics(experiment, result: dict) -> None:
    """Attach held-out test metrics when a non-empty test split exists.

    Final held-out numbers (the reference's headline metrics are
    test-split MAE/NVE); apps without a test split report validation
    only — never silently aliased (experiment.py). An EMPTY test split
    (e.g. --test_dataset_size 0) reports ``"test": null`` rather than
    crashing after a full training run (Experiment.evaluate raises on
    len-0 datasets).
    """
    if experiment.test_dataset is None:
        return
    if len(experiment.test_dataset) == 0:
        result["test"] = None
        return
    result["test"] = experiment.test()


if __name__ == "__main__":
    sys.exit(main())
