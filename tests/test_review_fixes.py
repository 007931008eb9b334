"""Regression tests for review findings: binaural training wiring, odd batch
sizes, CLI resume, fold-aware inference stats, RIFF pad bytes."""

import dataclasses
import os
import struct

import numpy as np
import pytest

import jax

from sed_crnn_tpu.core.config import get_preset
from sed_crnn_tpu.data import store, wavio
from sed_crnn_tpu.data.sampler import BalancedWindowSampler
from sed_crnn_tpu.data.rasterize import rasterize_events
from sed_crnn_tpu.train import loop as train_loop


def test_binaural_preset_trains_from_fold_pack(tmp_path, rng):
    """The advertised binaural path: channel-stacked (frames, n_mels*2) fold
    features straight into run_fold with the binaural preset."""
    frames = 2000
    mel = rng.standard_normal((frames, 80)).astype(np.float32)  # 2 x 40 stacked
    lab = (rng.random((frames, 6)) < 0.05).astype(np.float32)
    fold = {"train_x": mel, "train_y": lab, "val_x": mel[:1000], "val_y": lab[:1000]}

    cfg = get_preset("sednet-dcase-binaural")
    cfg = cfg.replace(
        model=dataclasses.replace(
            cfg.model, conv_channels=(4, 4, 4), gru_hidden=(4, 4), seq_len_in=128
        ),
        train=dataclasses.replace(cfg.train, batch_size=4, max_epochs=1, plot_every=0),
    )
    res = train_loop.run_fold(cfg, fold, 1, str(tmp_path), verbose=False)
    assert res.epochs_run == 1
    assert np.isfinite(res.history["loss_tr"][0])


def test_binaural_channel_split_order(rng):
    """(B, T, 2F) stacked input must equal the explicitly split (B, 2, T, F)."""
    import jax.numpy as jnp

    from sed_crnn_tpu.models import get_model
    from sed_crnn_tpu.nn.layers import Ctx

    cfg = dataclasses.replace(
        get_preset("sednet-dcase-binaural").model,
        conv_channels=(4, 4, 4), gru_hidden=(4, 4), seq_len_in=64,
    )
    model = get_model(cfg)
    params, state = model.init(jax.random.PRNGKey(0))
    x = rng.standard_normal((2, 64, 80)).astype(np.float32)
    split = np.stack([x[..., :40], x[..., 40:]], axis=1)  # (B, 2, T, 40)

    a, _, _ = model.apply(params, state, jnp.asarray(x), Ctx(train=False))
    b, _, _ = model.apply(params, state, jnp.asarray(split), Ctx(train=False))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_odd_batch_size(rng):
    mel = rng.standard_normal((2000, 40)).astype(np.float32)
    lab = rasterize_events([(5.0, 5.5), (20.0, 20.5)], 2000, 44100, 1024)
    s = BalancedWindowSampler(mel, lab)
    x, y = s.sample_batch_jit(jax.random.PRNGKey(0), 63)
    assert x.shape == (63, 64, 40) and y.shape == (63, 8, 1)
    # interleave preserved: even indices positive-anchored
    starts = np.asarray(s.sample_starts(jax.random.PRNGKey(1), 63))
    assert len(starts) == 63
    for i in range(0, 63, 2):
        assert lab[starts[i] : starts[i] + 64, 0].sum() > 0


@pytest.mark.slow
def test_train_cli_resume_reuses_run_dir(tmp_path):
    from sed_crnn_tpu.apps import train as train_app

    base = [
        "--preset", "timepooled-v2", "--synthetic", "--folds", "1",
        "--art-dir", str(tmp_path), "--batch-size", "32",
        "--plot-every", "0", "--slow-prng",
    ]
    train_app.main(base + ["--max-epochs", "1"])
    runs = sorted(p for p in tmp_path.iterdir() if p.is_dir())
    assert len(runs) == 1
    train_app.main(base + ["--max-epochs", "2", "--resume"])
    runs_after = sorted(p for p in tmp_path.iterdir() if p.is_dir())
    assert runs_after == runs  # same run directory reused
    import json

    lines = (runs[0] / "fold1" / "train_fold1.jsonl").read_text().splitlines()
    epochs = [json.loads(l)["epoch"] for l in lines]
    assert epochs == [1, 2]  # continued at epoch 2, not restarted


def test_stats_from_fold_excludes_test_split(tmp_path, rng):
    from sed_crnn_tpu.apps.infer import stats_from_fold

    # 4 videos; fold 1's test split = sorted index 0
    for i in range(4):
        mbe = np.full((100, 40), float(i), np.float32)
        lbl = np.zeros((100, 1), np.float32)
        store.save_video_features(
            store.video_feature_path(str(tmp_path), f"v{i}.mp4"), mbe, lbl
        )
    mean, scale = stats_from_fold(str(tmp_path), fold_id=1)
    # train videos for fold 1 are v1, v2, v3 -> mean 2.0 (v0 excluded)
    np.testing.assert_allclose(mean, 2.0, atol=1e-6)
    mean2, _ = stats_from_fold(str(tmp_path), fold_id=2)  # excludes v1
    np.testing.assert_allclose(mean2, (0 + 2 + 3) / 3, atol=1e-6)


def test_stats_from_fold_prefers_recorded_pack_stats(tmp_path, rng):
    """When the fold pack records its train stats (arr_4/arr_5), serving uses
    the EXACT training statistics instead of the round-robin refit."""
    from sed_crnn_tpu.apps.infer import stats_from_fold

    per_video = {}
    for i in range(4):
        mbe = rng.standard_normal((120, 40)).astype(np.float32) + i
        lbl = np.zeros((120, 1), np.float32)
        lbl[10:20] = 1.0
        per_video[f"v{i}.mp4"] = (mbe, lbl, i % 4)
        store.save_video_features(
            store.video_feature_path(str(tmp_path), f"v{i}.mp4"), mbe, lbl
        )
    store.pack_folds(per_video, str(tmp_path))
    mean, scale = stats_from_fold(str(tmp_path), fold_id=2)
    rec_mean, rec_scale = store.load_fold_stats(str(tmp_path), 2)
    np.testing.assert_array_equal(mean, rec_mean)
    np.testing.assert_array_equal(scale, rec_scale)


def test_stats_from_fold_refuses_dcase_style_refit(tmp_path):
    """Multi-class per-file caches (DCASE) without a stats-bearing pack must
    be refused: their folds follow evaluation_setup lists, so the Decorte
    round-robin refit would compute wrong statistics."""
    import pytest

    from sed_crnn_tpu.apps.infer import stats_from_fold

    for i in range(3):
        mbe = np.zeros((80, 40), np.float32)
        lbl = np.zeros((80, 6), np.float32)  # 6-class DCASE-style labels
        store.save_video_features(
            store.video_feature_path(str(tmp_path), f"a{i:03d}.wav"), mbe, lbl
        )
    with pytest.raises(ValueError, match="evaluation_setup"):
        stats_from_fold(str(tmp_path), fold_id=1)


def test_wav_pad_byte_after_odd_data_chunk(tmp_path):
    """data chunk with odd byte size followed by the fmt chunk: the parser
    must consume the pad byte to find fmt."""
    samples = np.array([10, 250, 128], dtype=np.uint8)  # 3 bytes (odd), 8-bit PCM
    data_chunk = struct.pack("<4sI", b"data", 3) + samples.tobytes() + b"\x00"
    fmt_chunk = struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, 1, 8000, 8000, 1, 8)
    body = b"WAVE" + data_chunk + fmt_chunk
    p = str(tmp_path / "odd.wav")
    with open(p, "wb") as f:
        f.write(struct.pack("<4sI", b"RIFF", len(body)) + body)
    x, sr = wavio.read_wav(p)
    assert sr == 8000 and x.shape == (3,)
    np.testing.assert_allclose(x, (samples.astype(np.float32) - 128) / 128, atol=1e-6)


def test_decode_audio_multichannel_contract(tmp_path, rng):
    x = rng.uniform(-0.5, 0.5, (1000, 2)).astype(np.float32)
    p = str(tmp_path / "st.wav")
    wavio.write_wav(p, x, 44100)
    out = wavio.decode_audio(p, sr=44100, mono=False)
    assert out.shape == (1000, 2)
