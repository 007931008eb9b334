"""Event-list interchange (DCASE / sed_eval rows) and the standalone
event-scoring tool."""

import json

import numpy as np
import pytest

from sed_crnn_tpu.apps.score_events import main as score_main, score_event_lists
from sed_crnn_tpu.data.eventio import (
    default_class_names,
    events_by_file,
    format_event_list,
    map_labels,
    read_event_list,
    write_event_list,
)
from sed_crnn_tpu.ops.event_metrics import aggregate_event_scores, event_scores


def test_write_read_roundtrip(tmp_path):
    events = [(2.5, 3.1, 1), (0.25, 1.0, 0)]
    path = str(tmp_path / "out.txt")
    write_event_list(path, events, class_names=("hit", "car"))
    rows = read_event_list(path)
    # sorted by onset, labels mapped
    assert rows == [(None, 0.25, 1.0, "hit"), (None, 2.5, 3.1, "car")]
    back = map_labels(events_by_file(rows)[None], ("hit", "car"))
    assert back == [(0.25, 1.0, 0), (2.5, 3.1, 1)]


def test_write_with_filename_column(tmp_path):
    path = str(tmp_path / "out.txt")
    write_event_list(path, [(1.0, 2.0, "car")], filename="a001.wav")
    text = open(path).read()
    assert text.splitlines()[0].split("\t") == [
        "a001.wav", "1.000000", "2.000000", "car"
    ]
    rows = read_event_list(path)
    assert rows == [("a001.wav", 1.0, 2.0, "car")]


def test_read_tut_meta_form(tmp_path):
    """The TUT/DCASE meta.txt shape: filename, scene, onset, offset, label
    (plus trailing columns some releases carry)."""
    p = tmp_path / "meta.txt"
    p.write_text(
        "# comment\n"
        "audio/street/a001.wav\tstreet\t2.33\t4.77\tcar\tm\ta001.ann\n"
        "audio/street/a002.wav\tstreet\t0.50\t1.00\tpeople walking\n"
        "\n"
    )
    rows = read_event_list(str(p))
    assert rows == [
        ("audio/street/a001.wav", 2.33, 4.77, "car"),
        ("audio/street/a002.wav", 0.5, 1.0, "people walking"),
    ]


def test_read_two_column_and_whitespace(tmp_path):
    p = tmp_path / "plain.txt"
    p.write_text("0.5 1.5\n2.0 2.5 3\n")
    rows = read_event_list(str(p))
    assert rows == [(None, 0.5, 1.5, "0"), (None, 2.0, 2.5, "3")]


def test_read_numeric_filename_four_column(tmp_path):
    """A purely numeric file ID must not be mistaken for the onset."""
    p = tmp_path / "ids.txt"
    p.write_text("0\t1.0\t2.0\tcar\n7\t0.5\t0.9\thit\n")
    assert read_event_list(str(p)) == [
        ("0", 1.0, 2.0, "car"), ("7", 0.5, 0.9, "hit"),
    ]


def test_read_rejects_rows_without_times(tmp_path):
    p = tmp_path / "bad.txt"
    p.write_text("a.wav\tcar\n")
    with pytest.raises(ValueError, match="no onset/offset"):
        read_event_list(str(p))


def test_map_labels_unknown_raises():
    with pytest.raises(ValueError, match="unknown event label"):
        map_labels([(0.0, 1.0, "dog")], ("hit",))


def test_default_class_names():
    assert default_class_names(1) == ("hit",)
    assert default_class_names(6)[1] == "car"
    assert default_class_names(3) == ("0", "1", "2")


def test_aggregate_matches_single_stream():
    """With one file, aggregation must reproduce event_scores exactly."""
    ref = [(0.0, 1.0, "car"), (2.0, 3.0, "hit")]
    est = [(0.05, 1.0, "car"), (5.0, 6.0, "hit")]
    direct = event_scores(ref, est)
    agg = aggregate_event_scores([direct])
    for k, v in direct.items():
        assert agg[k] == pytest.approx(v, nan_ok=True)


def test_score_event_lists_per_file_no_cross_matching(tmp_path):
    """An estimated event in file B must not match a reference in file A
    even at identical times."""
    ref = tmp_path / "ref.txt"
    est = tmp_path / "est.txt"
    ref.write_text("a.wav\t1.0\t2.0\tcar\n")
    est.write_text("b.wav\t1.0\t2.0\tcar\n")
    overall, per_file = score_event_lists(str(ref), str(est))
    assert overall["tp"] == 0
    assert overall["deletions"] == 1 and overall["insertions"] == 1
    assert set(per_file) == {"a.wav", "b.wav"}

    # same events in the SAME file: perfect score
    est.write_text("a.wav\t1.0\t2.0\tcar\n")
    overall, _ = score_event_lists(str(ref), str(est))
    assert overall["tp"] == 1 and overall["er_event"] == 0.0


def test_score_event_lists_rejects_mixed_filename_presence(tmp_path):
    ref = tmp_path / "ref.txt"
    est = tmp_path / "est.txt"
    ref.write_text("a.wav\t1.0\t2.0\tcar\n")
    est.write_text("1.0\t2.0\tcar\n")
    with pytest.raises(ValueError, match="filename"):
        score_event_lists(str(ref), str(est))


def test_score_events_cli(tmp_path):
    ref = tmp_path / "ref.txt"
    est = tmp_path / "est.txt"
    # 2 refs in a.wav, 1 hit + 1 missed + 1 inserted; b.wav clean hit
    ref.write_text(
        "a.wav\t1.0\t2.0\tcar\na.wav\t4.0\t5.0\tcar\nb.wav\t0.0\t1.0\thit\n"
    )
    est.write_text(
        "a.wav\t1.1\t2.0\tcar\na.wav\t7.0\t8.0\tcar\nb.wav\t0.05\t1.0\thit\n"
    )
    out = tmp_path / "report.json"
    score_main(["--ref", str(ref), "--est", str(est), "--per-file",
                "--out", str(out)])
    payload = json.loads(out.read_text())
    o = payload["overall"]
    assert payload["n_files"] == 2
    assert o["tp"] == 2 and o["deletions"] == 1 and o["insertions"] == 1
    assert o["er_event"] == pytest.approx(2 / 3)
    assert set(payload["per_file"]) == {"a.wav", "b.wav"}
    # collar tightening demotes the 1.1-onset match
    overall_tight, _ = score_event_lists(str(ref), str(est), t_collar=0.05)
    assert overall_tight["tp"] == 1


def test_format_event_list_empty():
    assert format_event_list([]) == ""


# ---------------- property-based round trips ----------------

from hypothesis import given, settings, strategies as st  # noqa: E402

_labels = st.sampled_from(["car", "hit", "people walking", "0", "x y"])
_events = st.lists(
    st.tuples(
        st.floats(0, 1000, allow_nan=False, width=32),
        st.floats(0, 1000, allow_nan=False, width=32),
        _labels,
    ).map(lambda t: (min(t[0], t[1]), max(t[0], t[1]), t[2])),
    max_size=20,
)


@settings(max_examples=60, deadline=None)
@given(events=_events, fname=st.none() | st.sampled_from(["a.wav", "7", "0.5"]))
def test_event_list_roundtrip_property(tmp_path_factory, events, fname):
    """format -> parse returns the same rows (times at the 1e-6 write
    precision), for every filename shape including purely numeric ones."""
    path = str(tmp_path_factory.mktemp("ev") / "events.txt")
    write_event_list(path, events, filename=fname)
    rows = read_event_list(path)
    want = sorted(
        (round(float(s), 6), round(float(e), 6), c) for s, e, c in events
    )
    assert len(rows) == len(events)
    for (f, onset, offset, label), (s, e, c) in zip(rows, want):
        assert f == fname
        assert onset == pytest.approx(s, abs=1e-6)
        assert offset == pytest.approx(e, abs=1e-6)
        assert label == c
