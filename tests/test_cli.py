"""CLI entry tests: settings overrides, evaluate_only, error paths."""

import json
import os

import numpy as np
import pytest

from srgan_tpu.__main__ import main


def _common_args(tmp_path):
    return ["--steps_to_run", "4", "--batch_size", "8",
            "--labeled_dataset_size", "16", "--unlabeled_dataset_size",
            "16", "--validation_dataset_size", "8",
            "--test_dataset_size", "8", "--hidden_size", "8",
            "--logs_directory", str(tmp_path / "logs"),
            "--trial_name", "cli"]


def test_train_then_evaluate_only(tmp_path, capsys):
    rc = main(["coefficient"] + _common_args(tmp_path))
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    trial_dir = out["trial_directory"]
    assert os.path.isdir(os.path.join(trial_dir, "checkpoints"))

    rc = main(["coefficient", "--evaluate_only",
               "--load_model_path", trial_dir] + _common_args(tmp_path))
    assert rc == 0
    result = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # evaluate_only on the restored state reproduces the trial's final
    # report — validation AND held-out test metrics.
    np.testing.assert_allclose(result["validation"]["MAE"],
                               out["validation"]["MAE"], rtol=1e-5)
    np.testing.assert_allclose(result["test"]["MAE"],
                               out["test"]["MAE"], rtol=1e-5)


def test_evaluate_only_requires_model_path(tmp_path):
    with pytest.raises(SystemExit, match="load_model_path"):
        main(["coefficient", "--evaluate_only"] + _common_args(tmp_path))


def test_unknown_setting_lists_known(tmp_path):
    with pytest.raises(SystemExit, match="unknown setting --bogus"):
        main(["coefficient", "--bogus", "1"])


def test_tuple_setting_parses_to_tuple():
    from srgan_tpu.__main__ import _parse_value
    from typing import Optional, Tuple
    value = _parse_value("[1, 5]", Optional[Tuple[int, int]])
    assert value == (1, 5) and isinstance(value, tuple)


def test_equals_form_and_none_value(tmp_path):
    rc = main(["coefficient", "--load_model_path=none"]
              + _common_args(tmp_path))
    assert rc == 0


def test_trial_directories_unique_within_same_second(tmp_path):
    from srgan_tpu.settings import Settings
    from srgan_tpu.utils.summary import make_trial_directory
    s = Settings(trial_name="dup", logs_directory=str(tmp_path))
    dirs = {make_trial_directory(s) for _ in range(3)}
    assert len(dirs) == 3  # uniquified, not silently shared


def test_preset_applies_with_override_precedence(tmp_path, capsys):
    """--preset loads the named bundle; explicit flags override it."""
    rc = main(["coefficient", "--preset", "coefficient_win",
               "--steps_to_run", "4", "--validation_step_period", "4",
               "--unlabeled_dataset_size", "64",
               "--validation_dataset_size", "8",
               "--logs_directory", str(tmp_path / "logs"),
               "--trial_name", "preset"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # preset fields took effect (hidden 100 → l16 in the trial name
    # tokens) while the explicit steps override won
    assert "_l16_" in out["trial_directory"]
    assert np.isfinite(out["validation"]["MAE"])
    assert np.isfinite(out["test"]["MAE"])  # held-out split reported too


def test_unknown_preset_lists_choices():
    with pytest.raises(SystemExit, match="coefficient_win"):
        main(["coefficient", "--preset", "nope"])


def test_dnn_only_reports_trained_model_metrics(tmp_path):
    """dnn_only trials must evaluate the TRAINED supervised model by
    default — not the untrained discriminator init (which is what
    use_dnn=False would measure)."""
    from srgan_tpu.apps.coefficient import CoefficientExperiment
    from srgan_tpu.settings import Settings

    s = Settings(trial_name="dnnonly", logs_directory=str(tmp_path / "l"),
                 batch_size=8, steps_to_run=60, summary_step_period=60,
                 labeled_dataset_size=64, unlabeled_dataset_size=16,
                 validation_dataset_size=64, hidden_size=16,
                 learning_rate=3e-3, dnn_only=True)
    exp = CoefficientExperiment(s)
    exp.train()
    default = exp.evaluate()["MAE"]
    dnn = exp.evaluate(use_dnn=True)["MAE"]
    d = exp.evaluate(use_dnn=False)["MAE"]
    assert default == dnn
    assert dnn < d  # trained baseline beats the untrained D init
    assert exp.test()["MAE"] == exp.test(use_dnn=True)["MAE"]


def test_cli_empty_test_split_reports_null(tmp_path, capsys):
    """--test_dataset_size 0 must not crash the CLI after a full training
    run; the final JSON reports "test": null instead (the explicit
    Experiment.test() call still raises — see test_empty_test_split_refuses).
    """
    rc = main(["coefficient"] + _common_args(tmp_path)
              + ["--test_dataset_size", "0"])  # last value wins
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["test"] is None
    assert np.isfinite(out["validation"]["MAE"])


def test_empty_test_split_refuses(tmp_path):
    from srgan_tpu.apps.coefficient import CoefficientExperiment
    from srgan_tpu.settings import Settings

    s = Settings(trial_name="emptytest", logs_directory=str(tmp_path / "l"),
                 batch_size=8, steps_to_run=2, summary_step_period=2,
                 labeled_dataset_size=16, unlabeled_dataset_size=16,
                 validation_dataset_size=8, test_dataset_size=0,
                 hidden_size=8)
    exp = CoefficientExperiment(s)
    exp.train()
    with pytest.raises(ValueError, match="empty"):
        exp.test()


def _crowd_args(tmp_path):
    return ["--steps_to_run", "3", "--batch_size", "8",
            "--labeled_dataset_size", "6", "--unlabeled_dataset_size",
            "8", "--validation_dataset_size", "3",
            "--test_dataset_size", "2",
            "--crowd_image_height", "80", "--crowd_image_width", "96",
            "--image_patch_size", "32", "--model_base_width", "8",
            "--latent_dimension", "16",
            "--logs_directory", str(tmp_path / "logs"),
            "--trial_name", "cliexp"]


def test_export_density_maps(tmp_path, capsys):
    out_npz = str(tmp_path / "maps.npz")
    rc = main(["crowd", "--export_density_maps", out_npz]
              + _crowd_args(tmp_path))
    assert rc == 0
    capsys.readouterr()
    with np.load(out_npz) as z:
        assert z["validation"].shape == (3, 80 // 4, 96 // 4)
        assert z["test"].shape == (2, 80 // 4, 96 // 4)
        assert np.isfinite(z["validation"]).all()


def test_export_density_maps_crowd_only(tmp_path):
    with pytest.raises(SystemExit, match="crowd-only"):
        main(["coefficient", "--export_density_maps",
              str(tmp_path / "m.npz")] + _common_args(tmp_path))


def test_cli_empty_validation_split_reports_null(tmp_path, capsys):
    """A validation_dataset_size=0 training run must still print its
    result JSON ('validation': null) instead of crashing post-train
    (review r3)."""
    args = ["crowd"] + _crowd_args(tmp_path)
    args[args.index("--validation_dataset_size") + 1] = "0"
    args[args.index("--test_dataset_size") + 1] = "0"
    rc = main(args)
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["validation"] is None
    assert out["test"] is None
    assert os.path.isdir(out["trial_directory"])


def test_export_density_maps_unwritable_fails_before_training(tmp_path):
    """An unwritable export destination must fail BEFORE the run, not
    after hours of training (review r3). Uses a file-as-parent path
    (mode bits don't stop root, so chmod can't model this)."""
    blocker = tmp_path / "blocker"
    blocker.write_text("")
    with pytest.raises(SystemExit, match="cannot write"):
        main(["crowd", "--export_density_maps",
              str(blocker / "maps.npz")] + _crowd_args(tmp_path))


def test_export_density_maps_evaluate_only(tmp_path, capsys):
    """The export flag works on the restore path too (the flow where a
    user most wants maps from a finished trial)."""
    rc = main(["crowd"] + _crowd_args(tmp_path))
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    npz = str(tmp_path / "eval_maps.npz")
    rc = main(["crowd", "--evaluate_only",
               "--load_model_path", out["trial_directory"],
               "--export_density_maps", npz] + _crowd_args(tmp_path))
    assert rc == 0
    result = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert np.isfinite(result["validation"]["MAE"])
    with np.load(npz) as z:
        assert z["validation"].shape == (3, 80 // 4, 96 // 4)


def test_every_settings_field_round_trips_through_the_parser():
    """Invariant over the WHOLE dataclass: any field's default value,
    rendered the way a user would type it, parses back equal — so every
    current and future Settings field stays drivable from the CLI."""
    import typing
    import dataclasses
    import json as _json
    from srgan_tpu.__main__ import _parse_value
    from srgan_tpu.settings import Settings

    hints = typing.get_type_hints(Settings)
    checked = 0
    for field in dataclasses.fields(Settings):
        default = field.default
        if default is dataclasses.MISSING or default is None:
            continue  # None round-trips via the explicit "none" token
        if isinstance(default, bool):
            raw = "true" if default else "false"
        elif isinstance(default, (tuple, list)):
            raw = _json.dumps(list(default))
        else:
            raw = str(default)
        got = _parse_value(raw, hints[field.name])
        assert got == default, (field.name, raw, got, default)
        checked += 1
    assert checked >= 30  # the dataclass is large; guard the guard
    # and the documented "none" token clears Optionals
    assert _parse_value("none", hints["load_model_path"]) is None
