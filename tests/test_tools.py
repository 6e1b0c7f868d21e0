"""Smoke tests for the tools/ harnesses (they guard capability claims)."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_sweep_harness_end_to_end(tmp_path):
    """Tiny grid through tools/sweep.py main(): trains vmapped lanes and
    writes well-formed result rows (the harness behind BASELINE.md's
    semi-supervised tables)."""
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import sweep

    out = tmp_path / "rows.json"
    rc = sweep.main(["--labeled-sizes", "8", "--seeds", "2",
                     "--steps", "30", "--unlabeled-size", "64",
                     "--ul", "1.0", "--fl", "1.0", "--gp", "10.0",
                     "--lr", "1e-3", "--mean-offset", "0.5",
                     "--out", str(out)])
    assert rc == 0
    rows = json.loads(out.read_text())
    assert len(rows) == 1
    row = rows[0]
    assert row["seeds"] == 2 and row["mean_offset"] == 0.5
    assert len(row["gan_mae_per_seed"]) == 2
    assert all(v > 0 for v in row["gan_mae_per_seed"])
    assert all(v > 0 for v in row["dnn_mae_per_seed"])


def test_golden_trace_cli_record_compare(tmp_path):
    """record → compare round-trips through the CLI in a subprocess (the
    tool forces CPU before backend init, which needs a fresh process)."""
    trace = tmp_path / "t.json"
    env = dict(os.environ, PYTHONPATH=REPO)
    for mode, extra in (("record", ["--out", str(trace)]),
                        ("compare", ["--trace", str(trace)])):
        result = subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "golden_trace.py"),
             mode, "--steps", "3"] + extra,
            capture_output=True, text=True, env=env, timeout=300)
        assert result.returncode == 0, result.stderr
    assert "matches" in result.stdout
