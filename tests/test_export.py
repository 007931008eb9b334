"""AOT serving-artifact export (`models/export.py`, `apps/export.py`).

The exported StableHLO programs must reproduce the live model bit-for-bit
(same platform, same dtype, weights baked as constants), serve any batch
size through the symbolic batch dimension, and round-trip through the zip
container with no framework code on the load path.
"""

import dataclasses
import json
import os
import zipfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sed_crnn_tpu.core import checkpoint as ckpt_io
from sed_crnn_tpu.core.config import get_preset
from sed_crnn_tpu.models import get_model
from sed_crnn_tpu.models.export import ServingArtifact, export_serving
from sed_crnn_tpu.nn.layers import Ctx

# Compile-heavy tier: deselect with `-m "not slow"` for the fast smoke pass
# (see pyproject [tool.pytest.ini_options] markers and docs/DESIGN.md).
pytestmark = pytest.mark.slow


def _tiny_cfg(**model_kw):
    cfg = get_preset("timepooled-v2")
    m = dataclasses.replace(
        cfg.model,
        conv_channels=(4, 4, 4),
        gru_hidden=(4,),
        head_dims=(1,),
        seq_len_in=16,
        compute_dtype="float32",
        gru_backend="xla",
        **model_kw,
    )
    return cfg.replace(model=m)


def _init(cfg, seed=0):
    model = get_model(cfg.model)
    params, state = model.init(jax.random.PRNGKey(seed))
    return model, params, state


def _ref_forward(model, params, state, x):
    logits, _, _ = model.apply(params, state, jnp.asarray(x), Ctx(train=False))
    return np.asarray(jax.nn.sigmoid(logits))


def test_forward_parity_and_symbolic_batch(rng):
    cfg = _tiny_cfg()
    model, params, state = _init(cfg)
    art = export_serving(cfg, params, state, platforms=("cpu",))
    feat = cfg.model.n_mels * cfg.model.in_channels
    for batch in (2, 5):  # one export serves both sizes (symbolic b)
        x = rng.standard_normal((batch, cfg.model.seq_len_in, feat)).astype(
            np.float32
        )
        got = np.asarray(art.forward(x))
        want = _ref_forward(model, params, state, x)
        assert got.shape == (batch, cfg.model.seq_len_out, cfg.model.n_classes)
        np.testing.assert_allclose(got, want, rtol=0, atol=1e-6)


def test_norm_stats_folded_into_program(rng):
    cfg = _tiny_cfg()
    model, params, state = _init(cfg)
    feat = cfg.model.n_mels
    mean = rng.standard_normal(feat).astype(np.float32)
    scale = (0.5 + rng.random(feat)).astype(np.float32)
    art = export_serving(
        cfg, params, state, norm_stats=(mean, scale), platforms=("cpu",)
    )
    assert art.meta["norm_folded"] is True
    raw = rng.standard_normal((3, cfg.model.seq_len_in, feat)).astype(np.float32)
    got = np.asarray(art.forward(raw))
    want = _ref_forward(model, params, state, (raw - mean) / scale)
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-6)


def test_save_load_roundtrip(rng, tmp_path):
    cfg = _tiny_cfg()
    model, params, state = _init(cfg)
    art = export_serving(cfg, params, state, platforms=("cpu",), preset="tiny")
    path = str(tmp_path / "model.sedart")
    art.save(path)

    loaded = ServingArtifact.load(path)
    assert loaded.meta["preset"] == "tiny"
    assert loaded.meta["seq_len_in"] == cfg.model.seq_len_in
    x = rng.standard_normal(
        (4, cfg.model.seq_len_in, cfg.model.n_mels)
    ).astype(np.float32)
    np.testing.assert_array_equal(
        np.asarray(loaded.forward(x)), np.asarray(art.forward(x))
    )

    # A zip that is not a serving artifact is rejected by format tag.
    bogus = str(tmp_path / "bogus.sedart")
    with zipfile.ZipFile(bogus, "w") as zf:
        zf.writestr("meta.json", json.dumps({"format": "something-else"}))
    with pytest.raises(ValueError, match="artifact"):
        ServingArtifact.load(bogus)


def test_stream_matches_streaming_module(rng):
    from sed_crnn_tpu.models.streaming import stream_probabilities

    cfg = _tiny_cfg()
    model, params, state = _init(cfg)
    art = export_serving(cfg, params, state, platforms=("cpu",))
    frames = cfg.model.seq_len_in * 3 + 7  # exercises padding + trim
    mel = rng.standard_normal((frames, cfg.model.n_mels)).astype(np.float32)
    got = art.stream(mel)
    want = stream_probabilities(model, params, state, mel)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-6)


def test_binaural_streaming_and_export(rng):
    """in_channels=2: the streaming carry probe and the exported programs
    must size the feature axis as n_mels*channels (regression: _zero_carry
    used n_mels alone, breaking every binaural streaming call)."""
    from sed_crnn_tpu.models.streaming import stream_probabilities

    cfg = _tiny_cfg(in_channels=2)
    model, params, state = _init(cfg)
    feat = cfg.model.n_mels * 2
    mel = rng.standard_normal(
        (cfg.model.seq_len_in * 2 + 3, feat)
    ).astype(np.float32)
    want = stream_probabilities(model, params, state, mel)  # raised pre-fix

    art = export_serving(cfg, params, state, platforms=("cpu",))
    got = art.stream(mel)
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-6)


def test_ensemble_export_forward_and_stream(rng):
    """A 2-member ensemble artifact's forward is the mean of the members'
    sigmoid probabilities, and its streaming path equals two synchronized
    single-model streams averaged (per-member carries)."""
    from sed_crnn_tpu.train.evaluate import stack_trees

    cfg = _tiny_cfg()
    model, pa, sa = _init(cfg, seed=0)
    _, pb, sb = _init(cfg, seed=1)
    art = export_serving(
        cfg, stack_trees([pa, pb]), stack_trees([sa, sb]),
        platforms=("cpu",), ensemble_members=2,
    )
    assert art.meta["ensemble_members"] == 2
    feat = cfg.model.n_mels
    x = rng.standard_normal((3, cfg.model.seq_len_in, feat)).astype(np.float32)
    got = np.asarray(art.forward(x))
    want = (_ref_forward(model, pa, sa, x) + _ref_forward(model, pb, sb, x)) / 2
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-6)

    # streaming: member-wise single-model artifacts averaged
    arta = export_serving(cfg, pa, sa, platforms=("cpu",))
    artb = export_serving(cfg, pb, sb, platforms=("cpu",))
    mel = rng.standard_normal((3 * cfg.model.seq_len_in + 7, feat)).astype(
        np.float32
    )
    for lookahead in (False, True):
        ens_stream = art.stream(mel, lookahead=lookahead)
        want_stream = (
            arta.stream(mel, lookahead=lookahead)
            + artb.stream(mel, lookahead=lookahead)
        ) / 2
        np.testing.assert_allclose(ens_stream, want_stream, rtol=0, atol=1e-6)

    # identical members collapse to the single model exactly
    art_same = export_serving(
        cfg, stack_trees([pa, pa]), stack_trees([sa, sa]),
        platforms=("cpu",), ensemble_members=2,
    )
    np.testing.assert_allclose(
        np.asarray(art_same.forward(x)), _ref_forward(model, pa, sa, x),
        rtol=0, atol=1e-6,
    )


def test_multiplatform_lowering_serializes():
    """cpu+tpu multi-platform lowering works without TPU hardware attached
    and survives (de)serialization."""
    cfg = _tiny_cfg()
    _, params, state = _init(cfg)
    art = export_serving(cfg, params, state, platforms=("cpu", "tpu"))
    blob = bytes(art.fns["forward"].serialize())
    assert len(blob) > 0
    back = jax.export.deserialize(blob)
    assert set(p.lower() for p in back.platforms) == {"cpu", "tpu"}


def test_realtime_chain_matches_offline(rng):
    """The live serving chain — native StreamingFramer on PCM packets ->
    per-frame log-mel -> artifact stream_step — must reproduce the offline
    pipeline (frontend.extract on the whole file -> artifact.stream)."""
    import dataclasses as dc

    import jax.numpy as jnp

    from sed_crnn_tpu.ops import frontend as frontend_ops
    from sed_crnn_tpu.ops.mel import mel_filterbank
    from sed_crnn_tpu.ops.stft import hann_window, power_spectrum_fft
    from sed_crnn_tpu.utils import native

    if not native.native_available():
        pytest.skip("no g++ / native source")

    cfg = _tiny_cfg()
    fcfg = dc.replace(cfg.frontend, log_floor=1e-10)
    _, params, state = _init(cfg)
    art = export_serving(cfg, params, state, platforms=("cpu",))

    sr = fcfg.sample_rate
    pcm = (0.1 * rng.standard_normal(sr * 3)).astype(np.float32)

    # Offline: whole-file extraction, whole-recording streaming.
    mel_off = frontend_ops.extract(pcm, fcfg)
    probs_off = art.stream(mel_off)

    # Live: PCM packets -> frames -> log-mel rows -> chunk-at-a-time steps.
    fb = jnp.asarray(
        mel_filterbank(sr, fcfg.n_fft, fcfg.n_mels, fcfg.fmin, fcfg.fmax)
    )
    win = jnp.asarray(hann_window(fcfg.n_fft))

    def mel_rows(frames):
        power = power_spectrum_fft(jnp.asarray(frames), fcfg.n_fft, win)
        return np.asarray(
            jnp.log(jnp.maximum(power @ fb.T, fcfg.log_floor))
        )

    framer = native.StreamingFramer(fcfg.n_fft, fcfg.hop_length, fcfg.center)
    chunk_frames = cfg.model.seq_len_in
    carry = art.stream_init()
    pending, live = [], []
    i = 0
    while i < len(pcm):
        step = int(rng.integers(256, 8192))
        frames = framer.feed(pcm[i : i + step])
        i += step
        if frames.size:
            pending.append(mel_rows(frames))
        buf = np.concatenate(pending, axis=0) if pending else np.empty((0, fcfg.n_mels))
        while buf.shape[0] >= chunk_frames:
            carry, probs = art.stream_step(carry, buf[:chunk_frames])
            live.append(np.asarray(probs))
            buf = buf[chunk_frames:]
        pending = [buf] if buf.size else []
    # End of stream: flush the framer; ignore the final ragged partial chunk
    # exactly like art.stream's trim does.
    frames = framer.flush()
    if frames.size:
        pending.append(mel_rows(frames))

    probs_live = np.concatenate(live, axis=0)
    n = min(len(probs_live), len(probs_off))
    assert n > 0
    np.testing.assert_allclose(
        probs_live[:n], probs_off[:n], rtol=0, atol=2e-5
    )


def test_lookahead_streaming_matches_module(rng):
    """Artifact lookahead pair-steps == `stream_probabilities(lookahead=True)`."""
    from sed_crnn_tpu.models.streaming import stream_probabilities

    cfg = _tiny_cfg()
    model, params, state = _init(cfg)
    art = export_serving(cfg, params, state, platforms=("cpu",))
    mel = rng.standard_normal(
        (cfg.model.seq_len_in * 4 + 9, cfg.model.n_mels)
    ).astype(np.float32)
    got = art.stream(mel, lookahead=True)
    want = stream_probabilities(model, params, state, mel, lookahead=True)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-6)


def test_batched_streaming(rng):
    """stream_step_batch serves b concurrent streams; each stream's chain
    must match running it alone through stream_step."""
    cfg = _tiny_cfg()
    _, params, state = _init(cfg)
    art = export_serving(cfg, params, state, platforms=("cpu",))
    t_in, feat = cfg.model.seq_len_in, cfg.model.n_mels
    n_streams, n_chunks = 3, 4
    chunks = rng.standard_normal(
        (n_chunks, n_streams, t_in, feat)
    ).astype(np.float32)

    carry_b = art.stream_init_batch(n_streams)
    got = []
    for k in range(n_chunks):
        carry_b, probs = art.stream_step_batch(carry_b, chunks[k])
        got.append(np.asarray(probs))
    got = np.stack(got)  # (n_chunks, b, T_out, K)

    for s in range(n_streams):
        carry = art.stream_init()
        for k in range(n_chunks):
            carry, probs = art.stream_step(carry, chunks[k, s])
            np.testing.assert_allclose(
                got[k, s], np.asarray(probs), rtol=0, atol=1e-6
            )


def test_bf16_serving_export(rng):
    """compute_dtype="bfloat16" export runs and tracks the f32 program to
    bf16 trunk precision (the TPU serving fast path)."""
    cfg = _tiny_cfg()
    model, params, state = _init(cfg)
    f32 = export_serving(cfg, params, state, platforms=("cpu",))
    bf16 = export_serving(
        cfg, params, state, platforms=("cpu",), compute_dtype="bfloat16"
    )
    assert bf16.meta["model"]["compute_dtype"] == "bfloat16"
    x = rng.standard_normal((4, cfg.model.seq_len_in, cfg.model.n_mels)).astype(
        np.float32
    )
    a, b = np.asarray(f32.forward(x)), np.asarray(bf16.forward(x))
    assert b.dtype == np.float32 and np.isfinite(b).all()
    np.testing.assert_allclose(a, b, rtol=0, atol=0.03)  # bf16 trunk tol


def test_infer_cli_with_artifact(rng, tmp_path):
    """`sedtpu-infer --artifact`: wav in, events JSON out, with the
    frontend config, weights, and norm stats all coming from the artifact."""
    from sed_crnn_tpu.apps import infer as infer_app
    from sed_crnn_tpu.data.wavio import write_wav

    cfg = _tiny_cfg()
    model, params, state = _init(cfg)
    feat = cfg.model.n_mels
    stats = (np.zeros(feat, np.float32), np.ones(feat, np.float32))
    art = export_serving(
        cfg, params, state, norm_stats=stats, platforms=("cpu",), preset="tiny"
    )
    path = str(tmp_path / "m.sedart")
    art.save(path)

    sr = cfg.frontend.sample_rate
    t = np.arange(sr * 2) / sr
    wav_path = str(tmp_path / "x.wav")
    write_wav(wav_path, (0.2 * np.sin(2 * np.pi * 880 * t)).astype(np.float32), sr)

    out = str(tmp_path / "events.json")
    infer_app.main(["--wav", wav_path, "--artifact", path, "--out", out])
    with open(out) as f:
        payload = json.load(f)
    assert payload["n_output_frames"] > 0
    assert isinstance(payload["events"], list)

    # exactly one of --checkpoint / --artifact
    with pytest.raises(SystemExit):
        infer_app.main(["--wav", wav_path])
    with pytest.raises(SystemExit):
        infer_app.main(
            ["--wav", wav_path, "--artifact", path, "--checkpoint", "x.npz"]
        )


def test_default_threshold_baked_and_used(rng, tmp_path):
    """`export_serving(default_threshold=...)` records the tuned operating
    point in the artifact metadata; artifact inference with no explicit
    threshold then decodes at it (tuned points ship WITH the model)."""
    cfg = _tiny_cfg()
    model, params, state = _init(cfg)

    with pytest.raises(ValueError, match="default thresholds"):
        export_serving(
            cfg, params, state, platforms=("cpu",),
            default_threshold=[0.3, 0.7],  # 2 values, 1 class
        )

    art = export_serving(
        cfg, params, state, platforms=("cpu",), default_threshold=0.999
    )
    path = str(tmp_path / "m.sedart")
    art.save(path)
    loaded = ServingArtifact.load(path)
    assert loaded.meta["default_threshold"] == 0.999

    vec = export_serving(
        cfg, params, state, platforms=("cpu",), default_threshold=[0.4]
    )
    assert vec.meta["default_threshold"] == [0.4]

    from sed_crnn_tpu.apps.infer import infer_file_artifact
    from sed_crnn_tpu.data.wavio import write_wav

    sr = cfg.frontend.sample_rate
    t = np.arange(sr * 2) / sr
    wav = str(tmp_path / "x.wav")
    write_wav(wav, (0.2 * np.sin(2 * np.pi * 660 * t)).astype(np.float32), sr)
    # baked 0.999: an untrained model's ~0.5 sigmoids decode to no events;
    # an explicit low threshold overrides the baked default and finds runs.
    _, ev_default, _ = infer_file_artifact(wav, path)
    _, ev_low, _ = infer_file_artifact(wav, path, threshold=0.0)
    assert len(ev_default) == 0
    assert len(ev_low) >= 1


def test_sednet_trunk_export(rng):
    """Mel-pooled multi-class trunk (the SEDnet geometry: seq_len_out ==
    seq_len_in, n_classes > 1): windowed and streaming programs both
    reproduce the live model."""
    from sed_crnn_tpu.models.streaming import stream_probabilities

    base = get_preset("sednet-dcase")
    m = dataclasses.replace(
        base.model,
        conv_channels=(4, 4, 4),
        gru_hidden=(4,),
        head_dims=(4, base.model.n_classes),
        seq_len_in=16,
        compute_dtype="float32",
        gru_backend="xla",
    )
    cfg = base.replace(model=m)
    assert m.pool_axis == "mel" and m.seq_len_out == 16 and m.n_classes == 6
    model, params, state = _init(cfg)
    art = export_serving(cfg, params, state, platforms=("cpu",))

    x = rng.standard_normal((3, 16, m.n_mels)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(art.forward(x)),
        _ref_forward(model, params, state, x),
        rtol=0,
        atol=1e-6,
    )
    mel = rng.standard_normal((16 * 2 + 5, m.n_mels)).astype(np.float32)
    np.testing.assert_allclose(
        art.stream(mel),
        stream_probabilities(model, params, state, mel),
        rtol=0,
        atol=1e-6,
    )


def test_tf_savedmodel_roundtrip(rng, tmp_path):
    """`--format tf`: the jax2tf SavedModel reproduces the live model with
    a polymorphic batch dimension and folded norm stats."""
    os.environ.setdefault("TF_ENABLE_ONEDNN_OPTS", "0")  # oneDNN bf16 convs
    tf = pytest.importorskip("tensorflow")

    from sed_crnn_tpu.models.export import export_tf_savedmodel

    cfg = _tiny_cfg()
    model, params, state = _init(cfg)
    feat = cfg.model.n_mels
    mean = rng.standard_normal(feat).astype(np.float32)
    scale = (0.5 + rng.random(feat)).astype(np.float32)
    out = str(tmp_path / "savedmodel")
    export_tf_savedmodel(cfg, params, state, out, norm_stats=(mean, scale))

    loaded = tf.saved_model.load(out)
    for batch in (2, 5):
        raw = rng.standard_normal(
            (batch, cfg.model.seq_len_in, feat)
        ).astype(np.float32)
        got = loaded.signatures["serving_default"](
            tf.constant(raw)
        )
        got = np.asarray(list(got.values())[0])
        want = _ref_forward(model, params, state, (raw - mean) / scale)
        np.testing.assert_allclose(got, want, rtol=0, atol=1e-5)


def test_export_cli(rng, tmp_path):
    cfg = _tiny_cfg()
    model, params, state = _init(cfg)
    ckpt = str(tmp_path / "best.npz")
    ckpt_io.save_checkpoint(
        ckpt, {"params": params, "model_state": state}, {"epoch": 3}
    )
    out = str(tmp_path / "model.sedart")

    from sed_crnn_tpu.apps import export as export_app
    from unittest import mock

    # The CLI resolves the preset by name; patch in the tiny config so the
    # test does not pay a full-width v1 export.
    with mock.patch("sed_crnn_tpu.core.config.get_preset", return_value=cfg):
        export_app.main(
            ["--checkpoint", ckpt, "--out", out, "--platforms", "cpu"]
        )

    loaded = ServingArtifact.load(out)
    x = rng.standard_normal(
        (2, cfg.model.seq_len_in, cfg.model.n_mels)
    ).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(loaded.forward(x)),
        _ref_forward(model, params, state, x),
        rtol=0,
        atol=1e-6,
    )

    # --stats-from pointing at a statsless dir must refuse, not silently
    # export an unnormalized model.
    empty = tmp_path / "empty_cache"
    empty.mkdir()
    with mock.patch("sed_crnn_tpu.core.config.get_preset", return_value=cfg):
        with pytest.raises(SystemExit):
            export_app.main(
                ["--checkpoint", ckpt, "--out", out, "--platforms", "cpu",
                 "--stats-from", str(empty)]
            )
