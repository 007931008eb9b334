"""Median-filter probability smoothing (`ops/postprocess.py`) — scipy
parity, event-decode effect, and the evaluate-report wiring."""

import numpy as np
import pytest
import scipy.signal

import jax
import jax.numpy as jnp

from sed_crnn_tpu.ops.postprocess import median_smooth


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.mark.parametrize("width", [3, 5, 7])
def test_matches_scipy_medfilt(rng, width):
    """Per-class running median equals scipy.signal.medfilt (the filter
    DCASE baselines use), including its zero-padded edges."""
    p = rng.random((97, 3)).astype(np.float32)
    got = median_smooth(p, width)
    assert isinstance(got, np.ndarray) and got.shape == p.shape
    for c in range(3):
        np.testing.assert_allclose(
            got[:, c],
            scipy.signal.medfilt(p[:, c].astype(np.float64), width),
            atol=1e-7,
        )


def test_identity_and_validation(rng):
    p = rng.random((50, 2)).astype(np.float32)
    assert median_smooth(p, 0) is p
    assert median_smooth(p, 1) is p
    with pytest.raises(ValueError, match="odd"):
        median_smooth(p, 4)


def test_1d_and_jax_inputs(rng):
    p = rng.random(60).astype(np.float32)
    got = median_smooth(p, 5)
    assert got.shape == (60,)
    np.testing.assert_allclose(
        got, scipy.signal.medfilt(p.astype(np.float64), 5), atol=1e-7
    )
    jout = median_smooth(jnp.asarray(p), 5)
    assert isinstance(jout, jax.Array)
    np.testing.assert_allclose(np.asarray(jout), got, atol=1e-7)


def test_removes_spurious_single_frames():
    """The point of the filter: an isolated one-frame activation vanishes, a
    one-frame dropout inside a genuine run is filled, and the run itself
    survives."""
    p = np.zeros((100, 1), np.float32)
    p[10, 0] = 0.9            # spurious single-frame spike
    p[40:60, 0] = 0.9         # genuine event ...
    p[50, 0] = 0.1            # ... with a single-frame dropout
    s = median_smooth(p, 3)
    assert s[10, 0] == 0.0
    assert (s[41:59, 0] == 0.9).all()  # dropout filled, run intact


def test_evaluate_split_median_filter_wiring(rng):
    """`evaluate_split(median_filter=w)` must equal recomputing by hand:
    forward -> sigmoid -> median_smooth -> binarize -> oracle metrics."""
    from sed_crnn_tpu.core.config import get_preset
    from sed_crnn_tpu.models import get_model
    from sed_crnn_tpu.nn.layers import Ctx
    from sed_crnn_tpu.train.evaluate import evaluate_split, window_split
    from tests.oracle.metrics_ref import ref_er_1sec, ref_f1_1sec

    cfg = get_preset("timepooled-v2")
    model = get_model(cfg.model)
    params, state = model.init(jax.random.PRNGKey(0))
    x = rng.standard_normal((2000, 40)).astype(np.float32) * 3.0
    y = (rng.random((2000, 1)) < 0.1).astype(np.float32)

    ths = np.asarray([0.5], np.float32)
    width = 9
    report = evaluate_split(
        model, params, state, x, y, cfg, thresholds=ths, batch_size=16,
        median_filter=width,
    )
    assert report["median_filter"] == width

    xw, yw = window_split(x, y, cfg.model.seq_len_in, cfg.model.seq_len_out)
    logits, _, _ = model.apply(params, state, jnp.asarray(xw), Ctx(train=False))
    probs = np.asarray(jax.nn.sigmoid(logits)).reshape(-1, 1)
    smoothed = median_smooth(probs, width)
    o = (smoothed > cfg.train.threshold).astype(np.float32)
    flat_y = yw.reshape(-1, 1)
    np.testing.assert_allclose(
        report["er_1s"], ref_er_1sec(o, flat_y, cfg.train.frames_in_1_sec),
        atol=1e-5,
    )
    np.testing.assert_allclose(
        report["f1_1s"], ref_f1_1sec(o, flat_y, cfg.train.frames_in_1_sec),
        atol=1e-5,
    )
    # the filter genuinely modified the probability track, and the report
    # exposes the confusion counts it was scored with
    assert not np.allclose(smoothed, probs)
    raw = evaluate_split(
        model, params, state, x, y, cfg, thresholds=ths, batch_size=16
    )
    assert raw["median_filter"] == 0
    assert {"tn", "fp", "fn", "tp"} <= set(raw["confusion"])
