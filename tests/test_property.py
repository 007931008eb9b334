"""Property-based validation (hypothesis): the jitted metrics against the
numpy oracle over adversarially-generated binary rolls (degenerate empties,
all-ones, single-frame bursts — the content classes where the reference
formulas' quirks live), plus rasterize/decode and sequence-reshape
invariants. Shapes are held fixed where a jit program is involved so one
compiled program serves every example."""

import numpy as np
import pytest

import jax.numpy as jnp
from hypothesis import given, settings, strategies as st

from sed_crnn_tpu.data.rasterize import events_from_labels, rasterize_events
from sed_crnn_tpu.data.seqs import split_in_seqs, split_multi_channels
from sed_crnn_tpu.ops import metrics

from tests.oracle.metrics_ref import (
    ref_er_1sec,
    ref_er_frame,
    ref_f1_1sec,
    ref_f1_frame,
)

FRAMES, CLASSES = 173, 3  # fixed so the jitted program compiles once


def _rolls(draw):
    """A (pred, ref) pair of binary rolls biased toward degenerate content:
    empty rows, saturated rows, and correlated pred/ref (realistic preds
    overlap refs; independent draws almost never exercise the TP paths)."""
    mode = draw(st.sampled_from(["empty_ref", "full", "sparse", "correlated"]))
    rng = np.random.default_rng(draw(st.integers(0, 2**31 - 1)))
    if mode == "empty_ref":
        ref = np.zeros((FRAMES, CLASSES), np.float32)
        pred = (rng.random((FRAMES, CLASSES)) < 0.1).astype(np.float32)
    elif mode == "full":
        ref = np.ones((FRAMES, CLASSES), np.float32)
        pred = (rng.random((FRAMES, CLASSES)) < 0.9).astype(np.float32)
    elif mode == "sparse":
        ref = (rng.random((FRAMES, CLASSES)) < 0.03).astype(np.float32)
        pred = (rng.random((FRAMES, CLASSES)) < 0.03).astype(np.float32)
    else:
        ref = (rng.random((FRAMES, CLASSES)) < 0.25).astype(np.float32)
        flip = (rng.random((FRAMES, CLASSES)) < 0.15).astype(np.float32)
        pred = np.abs(ref - flip)
    return pred, ref


@settings(max_examples=60, deadline=None)
@given(st.data(), st.sampled_from([1, 5, 43, 200]))
def test_metrics_match_oracle_on_adversarial_content(data, block):
    """Jitted segment/frame ER+F1 == numpy oracle for every content class,
    including blocks larger than the roll (200 > 173 frames) and the
    empty-reference division (both sides inf/nan the same way)."""
    pred, ref = _rolls(data.draw)
    got = metrics.all_scores(jnp.asarray(pred), jnp.asarray(ref), block)
    want = {
        "f1_frame": ref_f1_frame(pred, ref),
        "er_frame": ref_er_frame(pred, ref),
        "f1_overall_1sec": ref_f1_1sec(pred, ref, block),
        "er_overall_1sec": ref_er_1sec(pred, ref, block),
    }
    for k, w in want.items():
        g = float(got[k])
        if np.isnan(w) or np.isinf(w):
            assert np.isnan(g) or np.isinf(g), (k, g, w)
        else:
            np.testing.assert_allclose(g, w, rtol=1e-5, atol=1e-6, err_msg=k)


@settings(max_examples=60, deadline=None)
@given(st.data())
def test_rasterize_decode_roundtrip(data):
    """events -> labels -> events recovers every planted interval to frame
    quantization: decoded (start, end) within one hop of the original, same
    class, same count — provided the planted events are separated by more
    than one frame (closer events legitimately merge)."""
    sr, hop = 44100, 1024
    frame = hop / sr
    n_events = data.draw(st.integers(1, 8))
    rng = np.random.default_rng(data.draw(st.integers(0, 2**31 - 1)))
    events, t = [], 1.0
    for _ in range(n_events):
        dur = 3 * frame + float(rng.random()) * 1.5
        events.append((t, t + dur))
        # next event starts strictly after this one ends (plus >1 frame of
        # slack so ceil/floor quantization cannot bridge the gap)
        t += dur + 2 * frame + float(rng.random()) * 2.0
    cls = [int(c) for c in rng.integers(0, 2, n_events)]
    n_frames = int((events[-1][1]) / frame) + 10

    lbl = rasterize_events(events, n_frames, sr, hop, n_classes=2, class_ids=cls)
    decoded = events_from_labels(lbl, sr, hop)
    assert len(decoded) == n_events
    for (s, e), c, (ds, de, dc) in sorted(
        zip(events, cls, sorted(decoded, key=lambda t: t[0]))
    ):
        assert dc == c
        assert abs(ds - s) <= frame + 1e-9
        assert abs(de - e) <= frame + 1e-9


@settings(max_examples=40, deadline=None)
@given(
    st.integers(1, 500), st.integers(1, 7), st.integers(1, 5), st.integers(1, 4)
)
def test_split_in_seqs_and_channels_invariants(n, subdivs, feat, nch):
    """Reference `utils.py:28-41` semantics for arbitrary sizes: output is
    the truncated prefix reshaped, nothing reordered; split_multi_channels
    unstacks the feature axis into channels exactly."""
    rng = np.random.default_rng(n * 31 + subdivs)
    a = rng.standard_normal((n, feat)).astype(np.float32)
    out = split_in_seqs(a, subdivs)
    kept = (n // subdivs) * subdivs
    assert out.shape == (n // subdivs, subdivs, feat)
    np.testing.assert_array_equal(out.reshape(-1, feat), a[:kept])

    b = rng.standard_normal((3, subdivs, feat * nch)).astype(np.float32)
    mc = split_multi_channels(b, nch)
    assert mc.shape == (3, nch, subdivs, feat)
    for ch in range(nch):
        np.testing.assert_array_equal(
            mc[:, ch], b[..., ch * feat : (ch + 1) * feat]
        )
