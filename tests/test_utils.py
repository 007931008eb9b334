"""Debug guards, tracing accounting, and checkpoint discovery helpers."""

import numpy as np
import pytest

import jax.numpy as jnp

from sed_crnn_tpu.utils.debug import (
    NonFiniteError,
    assert_tree_finite,
    check_shape,
    guard_scores,
    tree_norms,
)
from sed_crnn_tpu.utils.tracing import StepClock


def test_assert_tree_finite_names_leaves():
    ok = {"a": jnp.ones(3), "b": [jnp.zeros(2)]}
    assert_tree_finite(ok)
    bad = {"a": jnp.ones(3), "b": [jnp.asarray([1.0, np.nan])]}
    with pytest.raises(NonFiniteError, match=r"\['b'\]\[0\]"):
        assert_tree_finite(bad, "params")


def test_guard_scores():
    guard_scores({"loss": 0.5}, 1, 1)
    with pytest.raises(NonFiniteError, match="fold 2 epoch 7"):
        guard_scores({"loss": float("nan")}, 7, 2)


def test_tree_norms():
    norms = tree_norms({"w": jnp.ones((2, 2))})
    assert norms["['w']"] == pytest.approx(2.0)


def test_check_shape():
    check_shape(np.zeros((4, 8)), (4, 8))
    check_shape(np.zeros((4, 8)), (-1, 8))
    with pytest.raises(ValueError, match="expected shape"):
        check_shape(np.zeros((4, 8)), (4, 9), "x")


def test_step_clock_throughput():
    clock = StepClock(window_frames=64)
    with clock:
        pass
    clock.elapsed = 2.0  # deterministic
    clock.add_windows(128 * 100)
    rec = clock.record()
    expect = 128 * 100 * 64 / (44100 / 1024.0) / 3600.0 / 2.0
    assert rec["audio_hours_per_sec"] == pytest.approx(expect, rel=1e-3)
