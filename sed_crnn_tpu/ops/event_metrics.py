"""Event-based SED metrics (onset/offset matching with collars).

Complements the segment-based scorer (`ops/metrics.py`, the reference's only
metric family) with the event-based F1/ER of Mesaros et al. 2016 named in
BASELINE config 4: decoded events are matched per class by onset proximity
(and optionally offset), unmatched references are deletions, unmatched system
events insertions, and substitutions pair up leftover deletions/insertions
that overlap in time across classes.

Event matching is irregular control flow, so it runs on host over decoded
event lists — the heavy part (frame probabilities) stays on device; a full
recording decodes to at most a few hundred events.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np

Event = Tuple[float, float, int]  # (onset_s, offset_s, class_id)


def events_from_roll(
    roll: np.ndarray, frame_hop_s: float, threshold: float = 0.5
) -> List[Event]:
    """Binary/probability frame roll (frames, classes) -> event list."""
    events: List[Event] = []
    active = np.asarray(roll) > threshold
    for cls in range(active.shape[1]):
        col = active[:, cls].astype(np.int8)
        edges = np.flatnonzero(np.diff(np.concatenate([[0], col, [0]])))
        for s, e in zip(edges[::2], edges[1::2]):
            events.append((s * frame_hop_s, e * frame_hop_s, cls))
    return events


def _match_events(
    ref: Sequence[Event],
    sys: Sequence[Event],
    t_collar: float,
    offset_condition: bool,
    offset_collar_frac: float,
) -> Tuple[int, List[Event], List[Event]]:
    """Greedy per-class onset matching (sed_eval-style). Returns
    (n_matched, unmatched_ref, unmatched_sys)."""
    matched = 0
    un_ref: List[Event] = []
    un_sys: List[Event] = list(sys)
    for r_on, r_off, r_cls in sorted(ref):
        best = None
        for i, (s_on, s_off, s_cls) in enumerate(un_sys):
            if s_cls != r_cls:
                continue
            if abs(s_on - r_on) > t_collar:
                continue
            if offset_condition:
                off_collar = max(t_collar, offset_collar_frac * (r_off - r_on))
                if abs(s_off - r_off) > off_collar:
                    continue
            if best is None or abs(s_on - r_on) < abs(un_sys[best][0] - r_on):
                best = i
        if best is None:
            un_ref.append((r_on, r_off, r_cls))
        else:
            matched += 1
            un_sys.pop(best)
    return matched, un_ref, un_sys


def _overlaps(a: Event, b: Event) -> bool:
    return a[0] < b[1] and b[0] < a[1]


def event_scores(
    ref_events: Sequence[Event],
    sys_events: Sequence[Event],
    t_collar: float = 0.2,
    offset_condition: bool = False,
    offset_collar_frac: float = 0.5,
) -> Dict[str, float]:
    """Event-based F1 and ER.

    TP: same-class system event with onset within ``t_collar`` of a reference
    onset (offset within max(collar, frac x duration) too when
    ``offset_condition``). Substitutions: a leftover deletion and insertion
    of different classes that overlap in time count as one substitution
    rather than one D + one I. ER = (S + D + I) / N_ref.
    """
    n_ref, n_sys = len(ref_events), len(sys_events)
    tp, un_ref, un_sys = _match_events(
        ref_events, sys_events, t_collar, offset_condition, offset_collar_frac
    )

    subs = 0
    remaining_sys = list(un_sys)
    for r in un_ref:
        for i, s in enumerate(remaining_sys):
            if s[2] != r[2] and _overlaps(r, s):
                subs += 1
                remaining_sys.pop(i)
                break
    deletions = len(un_ref) - subs
    insertions = len(remaining_sys)

    eps = np.finfo(np.float64).eps
    prec = tp / (n_sys + eps)
    rec = tp / (n_ref + eps)
    f1 = 2 * prec * rec / (prec + rec + eps)
    with np.errstate(divide="ignore", invalid="ignore"):
        er = (subs + deletions + insertions) / n_ref if n_ref else float("nan")
    return {
        "f1_event": float(f1),
        "er_event": float(er),
        "precision": float(prec),
        "recall": float(rec),
        "tp": tp,
        "substitutions": subs,
        "deletions": deletions,
        "insertions": insertions,
        "n_ref": n_ref,
        "n_sys": n_sys,
    }


def event_scores_from_rolls(
    pred_roll: np.ndarray,
    ref_roll: np.ndarray,
    frame_hop_s: float,
    threshold: float = 0.5,
    **kwargs,
) -> Dict[str, float]:
    """Convenience: frame rolls (frames, classes) -> event-based scores."""
    return event_scores(
        events_from_roll(ref_roll, frame_hop_s, 0.5),
        events_from_roll(pred_roll, frame_hop_s, threshold),
        **kwargs,
    )
