"""WAV I/O, catalogs, streaming inference, and the CLI apps end to end on
synthetic data (wav files -> features -> training -> inference)."""

import json
import os

import numpy as np
import pytest

import jax

from sed_crnn_tpu.core.config import get_preset
from sed_crnn_tpu.data import catalog, store, wavio
from sed_crnn_tpu.models import get_model
from sed_crnn_tpu.models.streaming import stream_probabilities
from sed_crnn_tpu.nn.layers import Ctx

# Compile-heavy tier: deselect with `-m "not slow"` for the fast smoke pass
# (see pyproject [tool.pytest.ini_options] markers and docs/DESIGN.md).
pytestmark = pytest.mark.slow


# ---------------- wav I/O ----------------


def test_wav_roundtrip_mono(tmp_path, rng):
    x = (0.5 * np.sin(2 * np.pi * 440 * np.arange(8000) / 44100)).astype(np.float32)
    p = str(tmp_path / "t.wav")
    wavio.write_wav(p, x, 44100)
    y, sr = wavio.read_wav(p)
    assert sr == 44100 and y.shape == x.shape
    np.testing.assert_allclose(y, x, atol=2.0 / 32768)


def test_wav_roundtrip_stereo_and_mono_mean(tmp_path, rng):
    x = rng.uniform(-0.5, 0.5, (4000, 2)).astype(np.float32)
    p = str(tmp_path / "s.wav")
    wavio.write_wav(p, x, 22050)
    y, sr = wavio.read_wav_multichannel(p)
    assert y.shape == (4000, 2) and sr == 22050
    np.testing.assert_allclose(y, x, atol=2.0 / 32768)
    m, _ = wavio.read_wav(p, mono=True)
    np.testing.assert_allclose(m, y.mean(axis=1), atol=1e-6)


def test_wav_rejects_garbage(tmp_path):
    p = str(tmp_path / "bad.wav")
    with open(p, "wb") as f:
        f.write(b"not a wave file at all")
    with pytest.raises(ValueError, match="RIFF"):
        wavio.read_wav(p)


# ---------------- catalog ----------------


def _write_catalog(tmp_path, rng, n_videos=5):
    media = tmp_path / "media"
    media.mkdir()
    rows = ["filename,start,end"]
    for i in range(n_videos):
        name = f"clip{i:02d}.wav"
        wavio.write_wav(str(media / name), rng.uniform(-0.1, 0.1, 44100 * 3).astype(np.float32), 44100)
        rows.append(f"{name},0.5,0.8")
        rows.append(f"{name},1.5,1.7")
    hits = tmp_path / "hits.csv"
    hits.write_text("\n".join(rows) + "\n")
    return str(media), str(hits)


def test_catalog_folds_and_events(tmp_path, rng):
    media, hits = _write_catalog(tmp_path, rng, 6)
    cat = catalog.load_event_catalog(media, hits, k_folds=4, verbose=False)
    assert len(cat) == 6
    assert [cat[k].fold_id for k in sorted(cat)] == [0, 1, 2, 3, 0, 1]
    assert cat["clip00.wav"].events == [(0.5, 0.8), (1.5, 1.7)]


def test_catalog_rejects_nonmonotone(tmp_path, rng):
    media, hits = _write_catalog(tmp_path, rng, 2)
    with open(hits, "a") as f:
        f.write("clip00.wav,0.1,0.2\n")  # start goes backwards after sort? no:
    # sorted by (filename, start) so starts are fine; break the END ordering
    with open(hits, "w") as f:
        f.write("filename,start,end\nclip00.wav,0.5,2.0\nclip00.wav,0.6,0.7\n")
    with pytest.raises(catalog.CatalogError, match="monotonicity"):
        catalog.load_event_catalog(media, hits, verbose=False)


def test_dcase_fold_list(tmp_path):
    setup = tmp_path / "evaluation_setup"
    setup.mkdir()
    (setup / "street_fold1_train.txt").write_text(
        "audio/street/a001.wav\tstreet\t1.0\t2.5\tcar\n"
        "audio/street/a001.wav\tstreet\t3.0\t4.0\tpeople walking\n"
        "audio/street/a002.wav\tstreet\n"
    )
    out = catalog.load_dcase_fold_list(str(setup), 1, "train")
    assert out["a001.wav"] == [(1.0, 2.5, 1), (3.0, 4.0, 5)]
    assert out["a002.wav"] == []
    with pytest.raises(catalog.CatalogError, match="unknown event label"):
        (setup / "street_fold2_train.txt").write_text(
            "audio/street/x.wav\tstreet\t0\t1\tspaceship\n"
        )
        catalog.load_dcase_fold_list(str(setup), 2, "train")


# ---------------- streaming ----------------


def test_streaming_matches_windowed_without_carry(rng):
    """carry_backward=False + zeroed fwd carry per chunk would equal windowed
    inference; with fwd carry the outputs must still be close on iid data and
    identical in shape. f32 compute pinned: the comparison is between two
    differently-compiled programs, which only agree exactly in f32."""
    import dataclasses

    model = get_model(
        dataclasses.replace(get_preset("timepooled-v2").model, compute_dtype="float32")
    )
    params, state = model.init(jax.random.PRNGKey(0))
    mel = rng.standard_normal((64 * 5 + 13, 40)).astype(np.float32)

    probs = stream_probabilities(model, params, state, mel)
    assert probs.shape == ((64 * 5 + 13) // 8, 1)
    assert np.isfinite(probs).all()

    # first chunk has zero carry -> must equal the plain windowed forward
    import jax.numpy as jnp

    logits_w, _, _ = model.apply(params, state, jnp.asarray(mel[None, :64]), Ctx())
    first = np.asarray(jax.nn.sigmoid(logits_w[0, :, 0]))
    np.testing.assert_allclose(probs[:8, 0], first, atol=1e-6)


def test_streaming_carry_propagates_context(rng):
    """With carried forward state, chunk 2 outputs differ from the no-context
    windowed forward (left context actually flows across the boundary)."""
    import dataclasses

    model = get_model(
        dataclasses.replace(get_preset("timepooled-v2").model, compute_dtype="float32")
    )
    params, state = model.init(jax.random.PRNGKey(0))
    mel = rng.standard_normal((128, 40)).astype(np.float32)
    probs = stream_probabilities(model, params, state, mel)

    import jax.numpy as jnp

    logits_w, _, _ = model.apply(params, state, jnp.asarray(mel[None, 64:128]), Ctx())
    windowed = np.asarray(jax.nn.sigmoid(logits_w[0, :, 0]))
    assert not np.allclose(probs[8:16, 0], windowed, atol=1e-6)


def test_streaming_lookahead_recovers_bidirectional_context(rng):
    """The lookahead buffer (emit chunk k after seeing k+1) must land closer
    to the full-sequence bidirectional oracle than the causal chunked path —
    and stay within a modest absolute band of it."""
    import dataclasses

    import jax.numpy as jnp

    model = get_model(
        dataclasses.replace(get_preset("timepooled-v2").model, compute_dtype="float32")
    )
    params, state = model.init(jax.random.PRNGKey(0))
    n_chunks = 6
    mel = rng.standard_normal((64 * n_chunks, 40)).astype(np.float32)

    # full-sequence bidirectional oracle: the whole recording as ONE window
    logits_full, _, _ = model.apply(params, state, jnp.asarray(mel[None]), Ctx())
    full = np.asarray(jax.nn.sigmoid(logits_full[0, :, 0]))

    causal = stream_probabilities(model, params, state, mel)[:, 0]
    look = stream_probabilities(model, params, state, mel, lookahead=True)[:, 0]
    assert look.shape == full.shape

    err_causal = np.abs(causal - full).mean()
    err_look = np.abs(look - full).mean()
    assert err_look < err_causal, (err_look, err_causal)
    assert np.abs(look - full).max() < 0.25
    assert err_look < 0.03

    # the first chunk's emission sees chunk 2 as real right context: it must
    # differ from the no-lookahead first chunk (context actually flows in)
    assert not np.allclose(look[:8], causal[:8], atol=1e-6)


# ---------------- apps end to end ----------------


def test_feature_train_infer_pipeline(tmp_path, rng):
    """The full user journey on real wav files: extract -> train -> infer."""
    from sed_crnn_tpu.apps import feature as feature_app
    from sed_crnn_tpu.apps import infer as infer_app
    from sed_crnn_tpu.apps import train as train_app

    # media with audible "hits": loud burst in each event interval
    media = tmp_path / "media"
    media.mkdir()
    rows = ["filename,start,end"]
    sr = 44100
    for i in range(8):
        t = np.arange(sr * 4) / sr
        x = 0.01 * rng.standard_normal(sr * 4).astype(np.float32)
        for s in (1.0, 2.5):
            a = int(s * sr)
            b = a + int(0.3 * sr)
            x[a:b] += (0.8 * np.sin(2 * np.pi * 3000 * t[: b - a])).astype(np.float32)
            rows.append(f"clip{i}.wav,{s},{s + 0.3}")
        wavio.write_wav(str(media / f"clip{i}.wav"), x, sr)
    hits = tmp_path / "hits.csv"
    hits.write_text("\n".join(rows[:1] + sorted(rows[1:])) + "\n")

    cache = tmp_path / "cache"
    feature_app.main(
        ["--media-dir", str(media), "--hits-csv", str(hits), "--cache-dir", str(cache)]
    )
    assert (cache / "mbe_mon_fold1.npz").exists()
    assert (cache / "clip0_mon.npz").exists()
    assert (cache / "feature_log.jsonl").exists()

    # cached second run must not recompute (jsonl row count unchanged)
    n_log = len((cache / "feature_log.jsonl").read_text().splitlines())
    feature_app.main(
        ["--media-dir", str(media), "--hits-csv", str(hits), "--cache-dir", str(cache)]
    )
    assert len((cache / "feature_log.jsonl").read_text().splitlines()) == n_log

    art = tmp_path / "art"
    train_app.main(
        [
            "--preset", "timepooled-v2", "--cache-dir", str(cache),
            "--art-dir", str(art), "--folds", "1", "--max-epochs", "2",
            "--batch-size", "16", "--plot-every", "0", "--slow-prng",
        ]
    )
    runs = sorted(art.iterdir())
    ckpt = runs[-1] / "fold1" / "best_fold1.npz"
    assert ckpt.exists()

    out_json = tmp_path / "events.json"
    infer_app.main(
        [
            "--wav", str(media / "clip0.wav"), "--checkpoint", str(ckpt),
            "--preset", "timepooled-v2", "--stats-from", str(cache),
            "--out", str(out_json),
        ]
    )
    payload = json.loads(out_json.read_text())
    assert payload["n_output_frames"] == (4 * 43 + 1) // 8
    assert isinstance(payload["events"], list)

    # DCASE/sed_eval interchange rows from the same checkpoint
    from sed_crnn_tpu.data.eventio import read_event_list

    out_txt = tmp_path / "events.txt"
    infer_app.main(
        [
            "--wav", str(media / "clip0.wav"), "--checkpoint", str(ckpt),
            "--preset", "timepooled-v2", "--stats-from", str(cache),
            "--format", "dcase", "--out", str(out_txt),
        ]
    )
    rows = read_event_list(str(out_txt)) if out_txt.read_text() else []
    assert len(rows) == len(payload["events"])
    for (_, onset, offset, label), ev in zip(rows, payload["events"]):
        assert label == "hit"
        assert onset == pytest.approx(ev["start_s"], abs=1e-3)
        assert offset == pytest.approx(ev["end_s"], abs=1e-3)


def test_train_app_synthetic(tmp_path):
    # v2 preset: the conv-128 v1 model is ~60x more conv FLOPs — far too slow
    # for the single-core CPU test runner (v1 training is covered on TPU and
    # by the torch-parity tests)
    from sed_crnn_tpu.apps import train as train_app

    train_app.main(
        [
            "--preset", "timepooled-v2", "--synthetic", "--folds", "1",
            "--art-dir", str(tmp_path), "--max-epochs", "1",
            "--batch-size", "32", "--plot-every", "0",
            "--slow-prng",  # keep the process-global PRNG impl untouched
        ]
    )
    runs = sorted(tmp_path.iterdir())
    assert (runs[-1] / "experiment.jsonl").exists()


def test_infer_threshold_arg_validation():
    """One global float passes through; a per-class vector must match the
    class count exactly (mismatches get a descriptive error, not a cryptic
    broadcast failure deep in the decode)."""
    from sed_crnn_tpu.apps.infer import _threshold_arg

    assert _threshold_arg(0.4, 6) == 0.4
    v = _threshold_arg([0.2, 0.3, 0.4, 0.5, 0.6, 0.7], 6)
    assert v.shape == (6,) and v.dtype == np.float32
    with pytest.raises(ValueError, match="thresholds for 6 classes"):
        _threshold_arg([0.2, 0.3], 6)


def test_infer_ensemble_averages_member_streams(tmp_path):
    """infer_file with several checkpoints streams each member with its own
    carried state and averages the probabilities — exactly the mean of the
    single-checkpoint runs."""
    import jax

    from sed_crnn_tpu.apps.infer import infer_file
    from sed_crnn_tpu.core import checkpoint as ckpt_io
    from sed_crnn_tpu.core.config import get_preset
    from sed_crnn_tpu.data.wavio import write_wav
    from sed_crnn_tpu.models import get_model

    t = np.arange(44100 * 3) / 44100.0
    y = (0.3 * np.sin(2 * np.pi * 880 * t)).astype(np.float32)
    wav = tmp_path / "tone.wav"
    write_wav(str(wav), y, 44100)

    cfg = get_preset("timepooled-v2")
    model = get_model(cfg.model)
    paths = []
    for i in range(2):
        params, state = model.init(jax.random.PRNGKey(i))
        p = tmp_path / f"ck{i}.npz"
        ckpt_io.save_checkpoint(
            str(p), {"params": params, "model_state": state}, {"epoch": i}
        )
        paths.append(str(p))

    ens, _, meta = infer_file(str(wav), paths, "timepooled-v2")
    assert len(meta["members"]) == 2
    a, _, _ = infer_file(str(wav), paths[0], "timepooled-v2")
    b, _, _ = infer_file(str(wav), paths[1], "timepooled-v2")
    np.testing.assert_allclose(ens, (a + b) / 2, rtol=0, atol=1e-6)
    assert not np.allclose(a, b)


def test_infer_digital_silence_finite_with_floor(tmp_path):
    """Recordings with exact digital silence produce log(0) = -inf parity
    features; the serving CLI's default log floor must keep probabilities
    finite, while log_floor=0 preserves the strict reference semantics."""
    import jax

    from sed_crnn_tpu.apps.infer import infer_file
    from sed_crnn_tpu.core import checkpoint as ckpt_io
    from sed_crnn_tpu.core.config import get_preset
    from sed_crnn_tpu.data.wavio import write_wav
    from sed_crnn_tpu.models import get_model
    from sed_crnn_tpu.train.optim import Adam

    t = np.arange(44100 * 4) / 44100.0
    y = (0.3 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    y[44100:88200] = 0.0  # one second of true digital silence
    wav = tmp_path / "silence.wav"
    write_wav(str(wav), y, 44100)

    cfg = get_preset("timepooled-v2")
    model = get_model(cfg.model)
    params, state = model.init(jax.random.PRNGKey(0))
    adam = Adam(learning_rate=1e-3)
    opt = adam.init(params)
    ckpt = tmp_path / "ckpt.npz"
    ckpt_io.save_checkpoint(str(ckpt), {
        "params": params, "model_state": state,
        "opt_state": {"step": opt.step, "mu": opt.mu, "nu": opt.nu},
        "lr_scale": jax.numpy.ones((), "float32")}, {"epoch": 0})

    probs, _, _ = infer_file(str(wav), str(ckpt), "timepooled-v2")
    assert np.all(np.isfinite(np.asarray(probs)))

    probs_parity, _, _ = infer_file(str(wav), str(ckpt), "timepooled-v2",
                                    log_floor=0.0)
    assert not np.all(np.isfinite(np.asarray(probs_parity)))
