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


def test_events_from_roll_per_class_thresholds():
    """A per-class threshold vector binarizes each class at its own operating
    point (the deploy side of `ops/metrics.py::best_per_class_thresholds`)."""
    hop = 1024 / 44100
    roll = np.zeros((100, 2), np.float32)
    roll[10:20, 0] = 0.4   # above class 0's threshold, below class 1's
    roll[50:60, 1] = 0.4   # below class 1's threshold -> no event
    roll[70:80, 1] = 0.9
    ev = events_from_roll(roll, hop, threshold=np.asarray([0.3, 0.7]))
    assert [(e[2], round(e[0] / hop)) for e in ev] == [(0, 10), (1, 70)]
    # the same roll at one global 0.3 threshold decodes the 0.4 run of class 1
    assert len(events_from_roll(roll, hop, threshold=0.3)) == 3


# ---------------------------------------------------------------------------
# sed_eval-semantics validation: brute-force optimal-matching oracle + goldens
# ---------------------------------------------------------------------------


def _hit(r, s, t_collar=0.2, offset_condition=False, frac=0.5):
    if abs(s[0] - r[0]) > t_collar:
        return False
    if offset_condition:
        if abs(s[1] - r[1]) > max(t_collar, frac * (r[1] - r[0])):
            return False
    return True


def _brute_scores(ref, sys, **kw):
    """Exhaustive oracle: enumerate every injective TP assignment, keep the
    maximum; over all maximum assignments, collect the achievable
    substitution counts (max-matched among leftovers). Independent of the
    package's Kuhn matcher — validates both matching stages."""
    n_ref, n_sys = len(ref), len(sys)

    def assignments(i, used):
        if i == n_ref:
            yield used
            return
        yield from assignments(i + 1, used)  # ref i unmatched
        for j in range(n_sys):
            if j not in used and sys[j][2] == ref[i][2] and _hit(ref[i], sys[j], **kw):
                yield from assignments(i + 1, {**used, j: i})

    best_tp, options = 0, []
    for used in assignments(0, {}):
        tp = len(used)
        if tp > best_tp:
            best_tp, options = tp, []
        if tp == best_tp:
            options.append(used)

    subs_values = set()
    for used in options:
        un_ref = [i for i in range(n_ref) if i not in used.values()]
        un_sys = [j for j in range(n_sys) if j not in used]

        def sub_assign(k, taken):
            if k == len(un_ref):
                yield len(taken)
                return
            yield from sub_assign(k + 1, taken)
            i = un_ref[k]
            for j in un_sys:
                if j not in taken and sys[j][2] != ref[i][2] and _hit(ref[i], sys[j], **kw):
                    yield from sub_assign(k + 1, taken | {j})

        subs_values.add(max(sub_assign(0, set())))
    return best_tp, subs_values


def test_crowded_collar_needs_maximum_matching():
    """Nearest-onset greedy undercounts here: R1 would steal S2 (nearest),
    leaving R2 (whose only eligible partner is S2) unmatched. The maximum
    bipartite matching pairs R1-S1, R2-S2 for a perfect score."""
    ref = [(1.0, 2.0, 0), (1.19, 2.2, 0)]
    sys = [(0.85, 2.0, 0), (1.02, 2.2, 0)]  # S1 only fits R1; S2 fits both
    s = event_scores(ref, sys)
    assert s["tp"] == 2
    assert s["er_event"] == 0.0 and s["f1_event"] == pytest.approx(1.0, abs=1e-9)


def test_substitution_requires_collar_not_overlap():
    """sed_eval substitutions demand the TEMPORAL conditions (onset collar),
    not mere time overlap: a wrong-class event overlapping the reference but
    onset-shifted 0.9 s is a deletion + insertion, not a substitution."""
    s = event_scores([(1.0, 3.0, 0)], [(1.9, 3.1, 1)])
    assert s["substitutions"] == 0
    assert s["deletions"] == 1 and s["insertions"] == 1
    assert s["er_event"] == 2.0


def test_golden_multiclass_worked_example():
    """Hand-computed: TP = {A, B}; the class-2 system event onsets 0.05 s from
    C (within the 0.2 s collar, different class) -> substitution; the last
    system event matches nothing -> insertion.
    ER = (S + D + I)/N = (1 + 0 + 1)/3; P = 2/4, R = 2/3, F1 = 4/7."""
    ref = [(1.0, 2.0, 0), (4.0, 5.0, 1), (7.0, 8.0, 0)]
    sys = [(1.1, 2.05, 0), (4.05, 5.2, 1), (7.05, 7.9, 2), (10.0, 11.0, 0)]
    s = event_scores(ref, sys)
    assert (s["tp"], s["substitutions"], s["deletions"], s["insertions"]) == (2, 1, 0, 1)
    assert s["er_event"] == pytest.approx(2.0 / 3.0, abs=1e-12)
    assert s["precision"] == pytest.approx(0.5, abs=1e-12)
    assert s["recall"] == pytest.approx(2.0 / 3.0, abs=1e-12)
    assert s["f1_event"] == pytest.approx(4.0 / 7.0, abs=1e-9)


def test_golden_offset_collar_stretch():
    """offset_condition: collar = max(t_collar, 0.5 * ref_duration).
    ref duration 4 s -> offset collar 2 s: offset error 1.9 s passes,
    2.1 s fails (becomes an insertion and the ref a deletion)."""
    ref = [(1.0, 5.0, 0)]
    assert event_scores(ref, [(1.1, 6.9, 0)], offset_condition=True)["tp"] == 1
    s = event_scores(ref, [(1.1, 7.1, 0)], offset_condition=True)
    assert s["tp"] == 0 and s["deletions"] == 1 and s["insertions"] == 1


def test_cross_validation_against_bruteforce_oracle():
    """Randomized small scenes: the package's two-stage Kuhn matching must
    reach the brute-force maximum TP, and report an achievable substitution
    count for SOME maximum TP assignment (sed_eval picks one arbitrarily)."""
    rng = np.random.default_rng(7)
    for case in range(200):
        n_ref = int(rng.integers(0, 5))
        n_sys = int(rng.integers(0, 5))
        offset_condition = bool(rng.integers(0, 2))

        def mk(n):
            out = []
            for _ in range(n):
                on = float(rng.uniform(0, 3))
                out.append((on, on + float(rng.uniform(0.1, 1.5)), int(rng.integers(0, 2))))
            return out

        ref, sys = mk(n_ref), mk(n_sys)
        s = event_scores(ref, sys, offset_condition=offset_condition)
        tp_star, subs_set = _brute_scores(ref, sys, offset_condition=offset_condition)
        assert s["tp"] == tp_star, (case, ref, sys)
        assert s["substitutions"] in subs_set, (case, ref, sys, s, subs_set)
        assert s["deletions"] == n_ref - s["tp"] - s["substitutions"]
        assert s["insertions"] == n_sys - s["tp"] - s["substitutions"]


def test_long_collar_chain_no_recursion_error():
    """Thousands of collar-chained same-class events must not blow the
    Python stack (the matcher is iterative): a dense flapping decode over a
    long clip pairs 1:1 with an offset copy of itself."""
    n = 1500
    ref = [(0.05 * i, 0.05 * i + 0.04, 0) for i in range(n)]
    sys = [(0.05 * i + 0.01, 0.05 * i + 0.05, 0) for i in range(n)]
    s = event_scores(ref, sys)
    assert s["tp"] == n and s["er_event"] == 0.0


def test_greedy_matching_mirrors_sed_eval_order_dependence():
    """matching="greedy" reproduces sed_eval's first-eligible-in-list-order
    pairing: ref r0 (eligible for both sys events) consumes the one r1
    needs, so greedy finds 1 TP where the optimal default finds 2."""
    ref = [(1.0, 1.3, 0), (1.1, 1.4, 0)]
    sys = [
        (1.05, 1.35, 0),  # within 0.2 s of BOTH refs
        (0.85, 1.15, 0),  # within 0.2 s of r0 only
    ]
    greedy = event_scores(ref, sys, t_collar=0.2, matching="greedy")
    optimal = event_scores(ref, sys, t_collar=0.2)
    assert greedy["tp"] == 1 and greedy["deletions"] == 1
    assert greedy["insertions"] == 1
    assert optimal["tp"] == 2 and optimal["er_event"] == 0.0
    assert greedy["er_event"] == 1.0  # (0 S + 1 D + 1 I) / 2


def test_greedy_equals_optimal_on_separated_scenes(rng):
    """On well-separated event tracks (one candidate per collar) the two
    matchers agree exactly — the typical evaluation regime."""
    for trial in range(20):
        ref, sys = [], []
        t = 0.0
        for k in range(15):
            t += 1.0 + rng.uniform(0, 0.5)
            cls = int(rng.integers(0, 3))
            ref.append((t, t + 0.4, cls))
            if rng.random() < 0.8:  # detected, maybe jittered or relabeled
                jitter = rng.uniform(-0.15, 0.15)
                sys_cls = cls if rng.random() < 0.8 else (cls + 1) % 3
                sys.append((t + jitter, t + 0.4 + jitter, sys_cls))
            if rng.random() < 0.2:  # spurious far-away insertion
                sys.append((t + 0.7, t + 0.9, cls))
        g = event_scores(ref, sys, t_collar=0.2, matching="greedy")
        o = event_scores(ref, sys, t_collar=0.2)
        assert g == o, (trial, g, o)


def test_event_scores_rejects_unknown_matching():
    with pytest.raises(ValueError, match="matching"):
        event_scores([], [], matching="fastest")


def test_class_wise_event_scores():
    from sed_crnn_tpu.ops.event_metrics import class_wise_event_scores

    # ref: one class-0 and one class-1 event; sys detects the class-0 event
    # but labels it class 1 (same interval) and misses class 1 entirely.
    ref = [(1.0, 2.0, 0), (5.0, 6.0, 1)]
    sys = [(1.0, 2.0, 1)]

    overall = event_scores(ref, sys)
    assert overall["substitutions"] == 1  # cross-class leftover pairing

    cw = class_wise_event_scores(ref, sys, n_classes=3)
    assert set(cw) == {0, 1, 2}
    # within class 0: the ref event is a deletion (sys has nothing of class 0)
    assert cw[0]["deletions"] == 1 and cw[0]["substitutions"] == 0
    # within class 1: one deletion (5-6s) and one insertion (1-2s), no subs
    assert cw[1]["deletions"] == 1 and cw[1]["insertions"] == 1
    assert cw[1]["substitutions"] == 0
    assert cw[1]["er_event"] == pytest.approx(2.0)
    # absent class: empty both sides
    assert cw[2]["n_ref"] == 0 and cw[2]["n_sys"] == 0

    # default class set = classes present in either list
    assert set(class_wise_event_scores(ref, sys)) == {0, 1}

    # perfect within-class detection scores 0 ER per class
    cw_ok = class_wise_event_scores(ref, ref, n_classes=2)
    assert all(cw_ok[c]["er_event"] == 0.0 for c in (0, 1))
