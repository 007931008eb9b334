"""Event-interval -> frame-label rasterization (reference `feature.py:89-93`
floor/ceil semantics) and the inverse for inspection."""

from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np


def rasterize_events(
    events: Sequence[Tuple[float, float]],
    n_frames: int,
    sr: int,
    hop: int,
    n_classes: int = 1,
    class_ids: Sequence[int] = None,
) -> np.ndarray:
    """Fill 1.0 over ``[floor(start*sr/hop), ceil(end*sr/hop))`` per event.

    ``class_ids`` gives the label column per event (all zeros for the
    single-class hit task; DCASE multi-class passes per-event ids).
    """
    lbl = np.zeros((n_frames, n_classes), dtype=np.float32)
    if class_ids is None:
        class_ids = [0] * len(events)
    for (start, end), cls in zip(events, class_ids):
        s = int(np.floor(start * sr / hop))
        e = int(np.ceil(end * sr / hop))
        s, e = max(s, 0), min(e, n_frames)
        if e > s:
            lbl[s:e, cls] = 1.0
    return lbl


def events_from_labels(
    labels: np.ndarray, sr: int, hop: int, threshold=0.5
):
    """Inverse of rasterization: contiguous active runs -> (start_s, end_s,
    class) tuples, for artifact/report generation. Thin wrapper over the
    event decoder shared with the event-based metrics. ``threshold``: one
    float, or a per-class vector (n_classes,)."""
    from sed_crnn_tpu.ops.event_metrics import events_from_roll

    return events_from_roll(labels, hop / sr, threshold)
