"""Event-based F1/ER: matching semantics, collars, substitutions."""

import numpy as np
import pytest

from sed_crnn_tpu.ops.event_metrics import (
    event_scores,
    event_scores_from_rolls,
    events_from_roll,
)


def test_perfect_match():
    ev = [(1.0, 1.5, 0), (3.0, 3.2, 1)]
    s = event_scores(ev, list(ev))
    assert s["f1_event"] == pytest.approx(1.0, abs=1e-9)
    assert s["er_event"] == 0.0
    assert s["tp"] == 2 and s["deletions"] == 0 and s["insertions"] == 0


def test_onset_collar():
    ref = [(1.0, 1.5, 0)]
    assert event_scores(ref, [(1.15, 1.5, 0)])["tp"] == 1   # within 200 ms
    assert event_scores(ref, [(1.25, 1.5, 0)])["tp"] == 0   # outside
    # wrong class never matches
    assert event_scores(ref, [(1.0, 1.5, 1)])["tp"] == 0


def test_offset_condition():
    ref = [(1.0, 2.0, 0)]
    sys = [(1.0, 3.5, 0)]  # offset off by 1.5 s; duration 1 s -> collar 0.5 s
    assert event_scores(ref, sys, offset_condition=True)["tp"] == 0
    assert event_scores(ref, sys, offset_condition=False)["tp"] == 1
    # long reference stretches the offset collar (frac 0.5)
    ref2 = [(1.0, 9.0, 0)]
    sys2 = [(1.1, 6.0, 0)]  # offset off by 3 < 0.5 * 8
    assert event_scores(ref2, sys2, offset_condition=True)["tp"] == 1


def test_substitution_vs_deletion_insertion():
    ref = [(1.0, 2.0, 0)]
    sys = [(1.0, 2.0, 1)]  # overlapping wrong class -> substitution
    s = event_scores(ref, sys)
    assert s["substitutions"] == 1 and s["deletions"] == 0 and s["insertions"] == 0
    assert s["er_event"] == 1.0

    sys_far = [(5.0, 6.0, 1)]  # non-overlapping -> deletion + insertion
    s2 = event_scores(ref, sys_far)
    assert s2["substitutions"] == 0 and s2["deletions"] == 1 and s2["insertions"] == 1
    assert s2["er_event"] == 2.0


def test_one_to_one_matching():
    """Two system events cannot both claim one reference."""
    ref = [(1.0, 2.0, 0)]
    sys = [(1.05, 2.0, 0), (0.95, 2.0, 0)]
    s = event_scores(ref, sys)
    assert s["tp"] == 1 and s["insertions"] == 1


def test_empty_reference_er_nan():
    s = event_scores([], [(1.0, 2.0, 0)])
    assert np.isnan(s["er_event"])
    assert s["insertions"] == 1


def test_events_from_roll_and_end_to_end():
    hop = 1024 / 44100
    roll = np.zeros((200, 2), np.float32)
    roll[43:65, 0] = 1.0
    roll[100:110, 1] = 1.0
    ev = events_from_roll(roll, hop)
    assert len(ev) == 2
    assert ev[0][2] == 0 and abs(ev[0][0] - 43 * hop) < 1e-9

    pred = roll.copy()
    pred[43:65, 0] = 0.0
    pred[45:64, 0] = 0.9  # onset shifted by 2 frames (~46 ms): still a match
    s = event_scores_from_rolls(pred, roll, hop)
    assert s["tp"] == 2 and s["er_event"] == 0.0
