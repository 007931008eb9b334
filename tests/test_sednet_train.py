"""Legacy DCASE pipeline training: sequence sampler semantics and an
end-to-end SEDnet-style fold run (tiny conv widths for the CPU runner)."""

import dataclasses

import numpy as np
import pytest

import jax

from sed_crnn_tpu.core.config import get_preset
from sed_crnn_tpu.data.sampler import SequenceWindowSampler
from sed_crnn_tpu.train import loop as train_loop

# Compile-heavy tier: deselect with `-m "not slow"` for the fast smoke pass
# (see pyproject [tool.pytest.ini_options] markers and docs/DESIGN.md).
pytestmark = pytest.mark.slow


def test_sequence_sampler_semantics(rng):
    frames, n_mels, n_classes = 1000, 40, 6
    mel = rng.standard_normal((frames, n_mels)).astype(np.float32)
    lab = (rng.random((frames, n_classes)) < 0.1).astype(np.float32)
    s = SequenceWindowSampler(mel, lab, seq_len_in=256, seq_len_out=256)
    assert s.n_windows == 3
    assert s.steps_per_epoch(2) == 2

    x, y = s.sample_batch(jax.random.PRNGKey(0), 8)
    assert x.shape == (8, 256, 40) and y.shape == (8, 256, 6)
    # windows are aligned: every sampled window matches a source slice
    xs = np.asarray(x)
    ys = np.asarray(y)
    for b in range(8):
        starts = [k * 256 for k in range(3)]
        match = [np.allclose(xs[b], mel[st : st + 256]) for st in starts]
        assert any(match)
        st = starts[match.index(True)]
        np.testing.assert_array_equal(ys[b], lab[st : st + 256])

    with pytest.raises(ValueError, match="sequence"):
        SequenceWindowSampler(mel[:100], lab[:100], seq_len_in=256)


def test_sequence_sampler_label_pooling(rng):
    """seq_len_out < seq_len_in pools labels (time-pooled model on the
    sequence sampler)."""
    mel = rng.standard_normal((640, 40)).astype(np.float32)
    lab = (rng.random((640, 1)) < 0.2).astype(np.float32)
    s = SequenceWindowSampler(mel, lab, seq_len_in=64, seq_len_out=8)
    x, y = s.sample_batch(jax.random.PRNGKey(1), 4)
    assert y.shape == (4, 8, 1)
    assert set(np.unique(np.asarray(y))) <= {0.0, 1.0}


def _dcase_like_fold(rng, frames=4000, n_classes=6):
    mel = rng.standard_normal((frames, 40)).astype(np.float32)
    lab = np.zeros((frames, n_classes), np.float32)
    for cls in range(n_classes):
        t = 50 + cls * 17
        while t < frames - 60:
            lab[t : t + 20, cls] = 1.0
            mel[t : t + 20, cls * 6 : cls * 6 + 6] += 3.0  # separable signature
            t += 300 + cls * 31
    return mel, lab


def test_sednet_fold_end_to_end(tmp_path, rng):
    cfg = get_preset("sednet-dcase")
    cfg = cfg.replace(
        model=dataclasses.replace(cfg.model, conv_channels=(8, 8, 8), gru_hidden=(8, 8)),
        train=dataclasses.replace(
            cfg.train, batch_size=8, max_epochs=3, plot_every=0
        ),
    )
    tr_x, tr_y = _dcase_like_fold(rng)
    va_x, va_y = _dcase_like_fold(rng, 2000)
    fold = {"train_x": tr_x, "train_y": tr_y, "val_x": va_x, "val_y": va_y}

    res = train_loop.run_fold(cfg, fold, 1, str(tmp_path), verbose=False)
    assert res.epochs_run == 3
    assert res.history["loss_tr"][-1] < res.history["loss_tr"][0]
    assert np.isfinite(res.best_er)
    assert (tmp_path / "best_fold1.npz").exists()
