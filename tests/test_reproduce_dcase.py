"""The one-command DCASE reproduction driver, end to end on a synthetic
miniature corpus (the real corpus is absent here — zero egress; this pins
the driver's plumbing so a corpus-bearing environment can run it as-is)."""

import importlib.util
import json
import os

from tests.test_pipeline_dcase import _fake_dcase_root

import pytest

# Compile-heavy tier: deselect with `-m "not slow"` for the fast smoke pass
# (see pyproject [tool.pytest.ini_options] markers and docs/DESIGN.md).
pytestmark = pytest.mark.slow

_SPEC = importlib.util.spec_from_file_location(
    "reproduce_dcase",
    os.path.join(os.path.dirname(__file__), "..", "scripts", "reproduce_dcase.py"),
)
reproduce_dcase = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(reproduce_dcase)


def test_reproduce_dcase_smoke(tmp_path, rng):
    root = _fake_dcase_root(tmp_path, rng)
    out = str(tmp_path / "report.json")
    report = reproduce_dcase.main([
        "--dcase-root", root,
        "--art-dir", str(tmp_path / "art"),
        "--folds", "1", "2",
        "--runs", "2",
        "--max-epochs", "2",
        "--batch-size", "4",
        "--smoke",
        "--out", out,
    ])
    assert report["channel"] == "single"
    assert report["baseline_er"] == 0.60 and report["baseline_f1"] == 0.57
    import numpy as np
    assert np.isfinite(report["er_1s"]) and np.isfinite(report["f1_1s"])
    # the multi-seed protocol actually ran: 2-seed std recorded
    assert "std_er" in report
    payload = json.loads(open(out).read())
    assert payload == report
    # cache + protocol artifacts landed
    assert os.path.exists(os.path.join(root, "sedtpu_cache", "mbe_mon_fold1.npz"))
    assert os.path.exists(
        os.path.join(str(tmp_path / "art"), "experiment_multiseed.jsonl")
    )
