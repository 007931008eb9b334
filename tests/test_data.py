"""Data subsystem: npz store contract, rasterization, sequence utils, and the
on-device balanced window sampler + SpecAugment."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sed_crnn_tpu.data import rasterize, seqs, store
from sed_crnn_tpu.data.sampler import (
    BalancedWindowSampler,
    balanced_counts,
    find_clean_negative_starts,
    spec_augment_batch,
)


# ---------------- rasterize ----------------


def test_rasterize_floor_ceil_semantics():
    sr, hop = 44100, 1024
    lbl = rasterize.rasterize_events([(1.0, 1.5)], 200, sr, hop)
    s = int(np.floor(1.0 * sr / hop))   # 43
    e = int(np.ceil(1.5 * sr / hop))    # 65
    assert lbl.shape == (200, 1)
    assert lbl[s : e, 0].all() and lbl[: s].sum() == 0 and lbl[e :].sum() == 0


def test_rasterize_clips_and_multiclass():
    lbl = rasterize.rasterize_events(
        [(0.0, 0.1), (1.0, 99.0)], 100, 44100, 1024, n_classes=3, class_ids=[0, 2]
    )
    assert lbl[:, 0].sum() > 0 and lbl[:, 1].sum() == 0
    # second event clipped to the raster length: active through the last frame
    assert lbl[99, 2] == 1.0 and lbl[42, 2] == 0.0
    assert lbl.shape == (100, 3)


def test_events_roundtrip():
    sr, hop = 44100, 1024
    lbl = rasterize.rasterize_events([(1.0, 1.5), (3.0, 3.2)], 300, sr, hop)
    ev = rasterize.events_from_labels(lbl, sr, hop)
    assert len(ev) == 2
    assert abs(ev[0][0] - 1.0) < hop / sr + 1e-6
    assert abs(ev[0][1] - 1.5) < hop / sr + 1e-6


# ---------------- seqs ----------------


def test_split_in_seqs_truncates():
    x = np.arange(10 * 3).reshape(10, 3)
    out = seqs.split_in_seqs(x, 4)
    assert out.shape == (2, 4, 3)
    np.testing.assert_array_equal(out[0], x[:4])
    out1d = seqs.split_in_seqs(np.arange(9), 4)
    assert out1d.shape == (2, 4, 1)


def test_split_multi_channels():
    n, t, f, nch = 3, 5, 4, 2
    x = np.arange(n * t * f * nch).reshape(n, t, f * nch)
    out = seqs.split_multi_channels(x, nch)
    assert out.shape == (n, nch, t, f)
    np.testing.assert_array_equal(out[:, 0], x[:, :, :f])
    np.testing.assert_array_equal(out[:, 1], x[:, :, f:])
    with pytest.raises(ValueError):
        seqs.split_multi_channels(x[0], nch)


def test_reshape_3d_to_2d():
    x = np.arange(24).reshape(2, 3, 4)
    assert seqs.reshape_3d_to_2d(x).shape == (6, 4)


# ---------------- store ----------------


def test_fold_pack_contract_and_normalization(tmp_path, rng):
    per_video = {}
    for i in range(8):
        frames = 200 + 17 * i
        mbe = rng.standard_normal((frames, 40)).astype(np.float32) * 2 + 1
        lbl = (rng.random((frames, 1)) < 0.1).astype(np.float32)
        per_video[f"vid{i}.mp4"] = (mbe, lbl, i % 4)

    paths = store.pack_folds(per_video, str(tmp_path))
    assert sorted(paths) == [1, 2, 3, 4]
    assert paths[1].endswith("mbe_mon_fold1.npz")

    # raw npz layout keeps the reference's arr_0..arr_3 positions; arr_4/5
    # are this framework's recorded train-split stats (mean, scale)
    raw = np.load(paths[2])
    assert set(raw.files) == {"arr_0", "arr_1", "arr_2", "arr_3", "arr_4", "arr_5"}
    assert raw["arr_4"].shape == (40,) and raw["arr_5"].shape == (40,)

    # the recorded stats really are the fit: un-normalizing train_x with them
    # recovers the raw concatenated features
    stats = store.load_fold_stats(str(tmp_path), 2)
    assert stats is not None
    mean, scale = stats
    raw_train = np.concatenate(
        [v[0] for v in per_video.values() if v[2] != 1], axis=0
    )
    np.testing.assert_allclose(
        raw["arr_0"] * scale + mean, raw_train, rtol=1e-4, atol=1e-4
    )

    fold = store.load_fold(str(tmp_path), 2)
    # train standardized to ~zero mean / unit var; val transformed with the
    # SAME stats (not its own)
    assert abs(fold["train_x"].mean()) < 1e-4
    assert abs(fold["train_x"].std() - 1.0) < 1e-3
    assert abs(fold["val_x"].mean()) > 1e-6  # not independently centered

    # train/test partition sizes: fold 2's test = videos with fold_id 1
    expect_test = sum(v[0].shape[0] for v in per_video.values() if v[2] == 1)
    assert fold["val_x"].shape == (expect_test, 40)

    everything = store.load_all_folds(str(tmp_path))
    assert set(everything) == {1, 2, 3, 4}


def test_video_feature_roundtrip(tmp_path, rng):
    mbe = rng.standard_normal((100, 40)).astype(np.float32)
    lbl = (rng.random((100, 1)) < 0.2).astype(np.float32)
    p = store.video_feature_path(str(tmp_path), "match_01.mp4")
    assert p.endswith("match_01_mon.npz")
    store.save_video_features(p, mbe, lbl)
    m2, l2 = store.load_video_features(p)
    np.testing.assert_array_equal(m2, mbe)
    np.testing.assert_array_equal(l2, lbl)


# ---------------- sampler ----------------


def _make_split(rng, frames=2000, events=15):
    mel = rng.standard_normal((frames, 40)).astype(np.float32)
    lab = np.zeros((frames, 1), np.float32)
    for _ in range(events):
        s = rng.integers(0, frames - 30)
        lab[s : s + rng.integers(3, 25), 0] = 1.0
    return mel, lab


def test_clean_negatives_have_no_positives(rng):
    _, lab = _make_split(rng)
    negs = find_clean_negative_starts(lab, 64)
    assert negs.size > 0
    for s in negs[:: max(1, len(negs) // 50)]:
        assert lab[s : s + 64, 0].sum() == 0


def test_sampler_balanced_and_correct(rng):
    mel, lab = _make_split(rng)
    s = BalancedWindowSampler(mel, lab, augment=False)
    x, y = s.sample_batch_jit(jax.random.PRNGKey(0), 64)
    assert x.shape == (64, 64, 40) and y.shape == (64, 8, 1)

    lab_j = jnp.asarray(lab)
    starts = s.sample_starts(jax.random.PRNGKey(1), 64)
    starts_np = np.asarray(starts)
    assert (starts_np >= 0).all() and (starts_np + 64 <= mel.shape[0]).all()
    # even positions positive-anchored, odd positions clean negative
    for i, st in enumerate(starts_np):
        window_pos = lab[st : st + 64, 0].sum()
        if i % 2 == 0:
            assert window_pos > 0
        else:
            assert window_pos == 0

    # labels are the max-pool of the true label window
    xg, yg = s.gather_windows(starts)
    ref_y = lab[starts_np[:, None] + np.arange(64)[None, :]].reshape(64, 8, 8, 1).max(2)
    np.testing.assert_array_equal(np.asarray(yg), ref_y)
    np.testing.assert_array_equal(np.asarray(xg[0]), mel[starts_np[0] : starts_np[0] + 64])


def test_sampler_deterministic_and_key_sensitive(rng):
    mel, lab = _make_split(rng)
    s = BalancedWindowSampler(mel, lab)
    x1, _ = s.sample_batch_jit(jax.random.PRNGKey(5), 32)
    x2, _ = s.sample_batch_jit(jax.random.PRNGKey(5), 32)
    x3, _ = s.sample_batch_jit(jax.random.PRNGKey(6), 32)
    np.testing.assert_array_equal(np.asarray(x1), np.asarray(x2))
    assert not np.array_equal(np.asarray(x1), np.asarray(x3))


def test_sampler_epoch_accounting(rng):
    mel, lab = _make_split(rng)
    s = BalancedWindowSampler(mel, lab)
    n_pos = int((lab[:, 0] == 1).sum())
    assert s.epoch_examples == 2 * n_pos
    assert s.steps_per_epoch(128) == (2 * n_pos) // 128


def test_sampler_multiclass_any_class_positive(rng):
    """Balanced sampling defines 'positive' as ANY class active — a split
    whose events live only in class 2 of a 3-class label must balance on
    those events, not silently on (empty) class 0."""
    frames = 3000
    mel = rng.standard_normal((frames, 40)).astype(np.float32)
    lab = np.zeros((frames, 3), np.float32)
    pos_regions = [(200, 260), (900, 930), (2100, 2180)]
    for a, b in pos_regions:
        lab[a:b, 2] = 1.0

    n_pos, n_neg = balanced_counts(lab, 64)
    assert n_pos == sum(b - a for a, b in pos_regions)
    assert n_neg > 0

    s = BalancedWindowSampler(mel, lab, augment=False)
    assert s.epoch_examples == 2 * n_pos
    starts = np.asarray(s.sample_starts(jax.random.PRNGKey(3), 64))
    any_pos = lab.max(axis=1)
    for i, st in enumerate(starts):
        window_pos = any_pos[st : st + 64].sum()
        if i % 2 == 0:
            assert window_pos > 0, f"even draw {i} missed all positives"
        else:
            assert window_pos == 0, f"odd draw {i} not a clean negative"

    # clean negatives respect every class, not just class 0
    negs = find_clean_negative_starts(lab, 64)
    for st in negs[:: max(1, len(negs) // 50)]:
        assert any_pos[st : st + 64].sum() == 0


def test_sampler_error_cases(rng):
    mel = rng.standard_normal((100, 40)).astype(np.float32)
    with pytest.raises(ValueError, match="no positive"):
        BalancedWindowSampler(mel, np.zeros((100, 1), np.float32))
    with pytest.raises(ValueError, match="no clean negative"):
        BalancedWindowSampler(mel, np.ones((100, 1), np.float32))
    with pytest.raises(ValueError, match="frames"):
        BalancedWindowSampler(mel[:10], np.zeros((10, 1), np.float32))


def test_spec_augment_masks(rng):
    x = jnp.ones((16, 64, 40))
    out = np.asarray(spec_augment_batch(jax.random.PRNGKey(0), x))
    assert out.shape == (16, 64, 40)
    for ex in out:
        # each example has zeroed time rows and freq cols
        zero_rows = int((ex.sum(axis=1) == 0).sum())
        zero_cols = int((ex.sum(axis=0) == 0).sum())
        assert 8 <= zero_rows <= 16  # 2 masks of width 8, possibly overlapping
        assert 8 <= zero_cols <= 16
    # different examples get different masks
    assert not np.array_equal(out[0], out[1])


def test_augmented_sampler_runs(rng):
    mel, lab = _make_split(rng)
    s = BalancedWindowSampler(mel, lab, augment=True)
    x, y = s.sample_batch_jit(jax.random.PRNGKey(0), 16)
    assert (np.asarray(x) == 0).sum() > 0  # stripes zeroed


def test_probe_media_meta_shape_and_fallback(tmp_path):
    """probe_media_meta returns the full OpenCV-parity field set; with no
    ffprobe (this image) or an unprobeable file, every field is None rather
    than raising."""
    from sed_crnn_tpu.data.wavio import probe_media_meta

    p = tmp_path / "x.mp4"
    p.write_bytes(b"not a real video")
    meta = probe_media_meta(str(p))
    assert set(meta) == {"fps", "n_frames", "width", "height", "duration_s"}
    assert all(v is None or isinstance(v, (int, float)) for v in meta.values())
