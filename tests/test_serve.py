"""The live serving daemon: PCM packets -> framer -> log-mel -> artifact
stream steps -> online event lines, against the offline pipeline as oracle."""

import io
import json

import numpy as np
import pytest

from sed_crnn_tpu.apps.serve import (
    OnlineEventDecoder,
    main as serve_main,
    pcm_chunks_from_stream,
    serve_stream,
)
from sed_crnn_tpu.models.export import export_serving
from sed_crnn_tpu.ops import frontend as frontend_ops
from sed_crnn_tpu.ops.event_metrics import events_from_roll
from sed_crnn_tpu.utils import native
from tests.test_export import _init, _tiny_cfg


def _random_packets(pcm, rng, lo=256, hi=8192):
    i = 0
    while i < len(pcm):
        step = int(rng.integers(lo, hi))
        yield pcm[i : i + step]
        i += step


def test_python_framer_matches_whole_signal_framing(rng):
    from sed_crnn_tpu.ops.stft import frame_signal

    n_fft, hop = 512, 256
    pcm = rng.standard_normal(44100).astype(np.float32)
    framer = native.PythonFramer(n_fft, hop)
    parts = [framer.feed(p) for p in _random_packets(pcm, rng)]
    parts.append(framer.flush())
    got = np.concatenate([p for p in parts if p.size], axis=0)
    want = np.asarray(frame_signal(pcm, n_fft, hop, center=True))
    n = min(len(got), len(want))
    assert n >= len(want) - 1  # at most the final pad-only frame differs
    np.testing.assert_array_equal(got[:n], want[:n])


@pytest.mark.skipif(not native.native_available(), reason="no native toolchain")
def test_python_framer_matches_native(rng):
    n_fft, hop = 512, 256
    pcm = rng.standard_normal(30000).astype(np.float32)
    pf = native.PythonFramer(n_fft, hop)
    nf = native.StreamingFramer(n_fft, hop)
    got_p, got_n = [], []
    for p in _random_packets(pcm, rng):
        got_p.append(pf.feed(p))
        got_n.append(nf.feed(p))
    got_p.append(pf.flush())
    got_n.append(nf.flush())
    a = np.concatenate([x for x in got_p if x.size], axis=0)
    b = np.concatenate([x for x in got_n if x.size], axis=0)
    np.testing.assert_array_equal(a, b)


def test_python_framer_flush_guard():
    f = native.PythonFramer(512, 256)
    f.feed(np.zeros(100, np.float32))
    with pytest.raises(ValueError, match="more than"):
        f.flush()
    with pytest.raises(RuntimeError, match="already flushed"):
        f.flush()


def test_pcm_chunk_decoding_handles_split_samples(rng):
    x = (rng.standard_normal(1000) * 0.3).astype(np.float32)
    raw = x.tobytes()
    got = np.concatenate(
        list(pcm_chunks_from_stream(io.BytesIO(raw), "f32le", chunk_bytes=333))
    )
    np.testing.assert_array_equal(got, x)

    s16 = (x * 32768.0).clip(-32768, 32767).astype("<i2")
    got16 = np.concatenate(
        list(pcm_chunks_from_stream(io.BytesIO(s16.tobytes()), "s16le",
                                    chunk_bytes=101))
    )
    np.testing.assert_allclose(got16, s16.astype(np.float32) / 32768.0)

    with pytest.raises(ValueError, match="unknown pcm format"):
        list(pcm_chunks_from_stream(io.BytesIO(b""), "u8"))


def test_online_event_decoder_matches_roll_decoder(rng):
    probs = rng.uniform(0, 1, (40, 3)).astype(np.float32)
    thr = np.asarray([0.5, 0.3, 0.7], np.float32)
    hop_s = 0.1
    dec = OnlineEventDecoder(3, hop_s, thr)
    got = []
    for i in range(0, 40, 7):  # ragged chunk sizes
        got += dec.push(probs[i : i + 7])
    got += dec.finish()
    want = events_from_roll(probs, hop_s, thr)
    assert len(got) == len(want)
    for g, w in zip(sorted(got), sorted(want)):
        assert g[2] == w[2]
        assert g[0] == pytest.approx(w[0]) and g[1] == pytest.approx(w[1])


def test_serve_stream_matches_offline_artifact(rng):
    cfg = _tiny_cfg()
    _, params, state = _init(cfg)
    art = export_serving(cfg, params, state, platforms=("cpu",))

    hop = cfg.frontend.hop_length
    # length chosen so the final ragged chunk carries >= pool frames — the
    # live path must pad-and-trim it exactly like artifact.stream (8 full
    # 16-frame chunks + a 10-frame tail -> one extra output frame)
    pcm = (0.1 * rng.standard_normal(hop * 137)).astype(np.float32)

    lines = []
    n_out, n_events = serve_stream(
        art, _random_packets(pcm, rng), lines.append,
        threshold=0.5, emit_probs=True, emit_events=True,
    )
    live = np.concatenate(
        [np.asarray(l["probs"]) for l in lines if l["type"] == "probs"], axis=0
    )
    assert live.shape[0] == n_out

    import dataclasses

    fcfg = dataclasses.replace(cfg.frontend, log_floor=1e-10)
    mel_off = frontend_ops.extract(pcm, fcfg)
    probs_off = art.stream(mel_off)
    assert mel_off.shape[0] % cfg.model.seq_len_in != 0  # tail chunk exists
    assert len(live) == len(probs_off)  # including the padded tail's frames
    np.testing.assert_allclose(live, probs_off, rtol=0, atol=1e-4)

    # the emitted events are the threshold decode of the emitted probs
    closed = [
        (l["start_s"], l["end_s"], l["class"])
        for l in lines
        if l["type"] == "event" and not l.get("open_at_eos")
    ]
    hop_s = cfg.frontend.hop_length * (
        cfg.model.seq_len_in // cfg.model.seq_len_out
    ) / cfg.frontend.sample_rate
    want = [
        (round(s, 3), round(e, 3), c)
        for s, e, c in events_from_roll(live, hop_s, 0.5)
    ]
    open_ends = {w for w in want if np.isclose(w[1], len(live) * hop_s, atol=2e-3)}
    assert set(closed) == set(want) - open_ends
    assert n_events == len(want)


def test_serve_stream_lookahead_matches_offline(rng):
    """Live pair-stepping (one chunk of latency) must reproduce the
    offline lookahead stream, including the held-back final chunk and a
    sub-pool ragged tail acting as real right context."""
    cfg = _tiny_cfg()
    _, params, state = _init(cfg)
    art = export_serving(cfg, params, state, platforms=("cpu",))

    hop = cfg.frontend.hop_length
    for n_samples in (hop * 137, hop * 130):  # tails of 10 and 3 frames
        pcm = (0.1 * rng.standard_normal(n_samples)).astype(np.float32)
        lines = []
        n_out, _ = serve_stream(
            art, _random_packets(pcm, rng), lines.append,
            threshold=0.5, emit_probs=True, lookahead=True,
        )
        live = np.concatenate(
            [np.asarray(l["probs"]) for l in lines if l["type"] == "probs"],
            axis=0,
        )
        import dataclasses

        fcfg = dataclasses.replace(cfg.frontend, log_floor=1e-10)
        probs_off = art.stream(frontend_ops.extract(pcm, fcfg), lookahead=True)
        assert live.shape[0] == n_out == len(probs_off)
        np.testing.assert_allclose(live, probs_off, rtol=0, atol=1e-4)


def test_serve_rejects_binaural_artifact(rng):
    cfg = _tiny_cfg(in_channels=2, n_mels=8)
    _, params, state = _init(cfg)
    art = export_serving(cfg, params, state, platforms=("cpu",))
    with pytest.raises(ValueError, match="single-channel"):
        serve_stream(art, iter([]), lambda _: None)


def test_serve_validates_threshold_count(rng):
    cfg = _tiny_cfg()
    _, params, state = _init(cfg)
    art = export_serving(cfg, params, state, platforms=("cpu",))
    with pytest.raises(ValueError, match="thresholds for"):
        serve_stream(art, iter([]), lambda _: None,
                     threshold=np.asarray([0.2, 0.3], np.float32))


def test_serve_cli_wav_end_to_end(tmp_path, rng):
    from sed_crnn_tpu.data import wavio

    cfg = _tiny_cfg()
    _, params, state = _init(cfg)
    art = export_serving(cfg, params, state, platforms=("cpu",))
    art_path = str(tmp_path / "model.sedart")
    art.save(art_path)

    sr = cfg.frontend.sample_rate
    pcm = (0.1 * rng.standard_normal(sr * 2)).astype(np.float32)
    wav = str(tmp_path / "live.wav")
    wavio.write_wav(wav, pcm, sr)

    out = tmp_path / "lines.jsonl"
    serve_main([
        "--artifact", art_path, "--wav", wav, "--emit", "both",
        "--threshold", "0.5", "--out", str(out),
    ])
    lines = [json.loads(l) for l in out.read_text().splitlines()]
    kinds = {l["type"] for l in lines}
    assert "summary" in kinds and "probs" in kinds
    summary = [l for l in lines if l["type"] == "summary"][0]
    assert summary["n_output_frames"] > 0
    for l in lines:
        if l["type"] == "event":
            assert l["label"] == "hit"  # 1-class default vocabulary


def test_serve_cli_tcp_listen(tmp_path, rng):
    """--listen serves PCM over a localhost TCP connection: bytes in,
    JSON lines back on the same socket."""
    import socket
    import threading
    import time

    cfg = _tiny_cfg()
    _, params, state = _init(cfg)
    art = export_serving(cfg, params, state, platforms=("cpu",))
    art_path = str(tmp_path / "model.sedart")
    art.save(art_path)

    probe = socket.socket()
    probe.bind(("127.0.0.1", 0))
    port = probe.getsockname()[1]
    probe.close()

    t = threading.Thread(
        target=serve_main,
        args=([
            "--artifact", art_path, "--pcm", "f32le", "--listen", str(port),
            "--connections", "1", "--emit", "both", "--threshold", "0.5",
        ],),
        daemon=True,
    )
    t.start()

    sr = cfg.frontend.sample_rate
    pcm = (0.1 * rng.standard_normal(sr)).astype(np.float32)
    s = None
    for _ in range(200):
        try:
            s = socket.create_connection(("127.0.0.1", port), timeout=0.5)
            break
        except OSError:
            time.sleep(0.05)
    assert s is not None, "server never started listening"
    s.settimeout(120)  # create_connection's 0.5 s would also govern recv
    s.sendall(pcm.tobytes())
    s.shutdown(socket.SHUT_WR)
    data = b""
    while True:
        chunk = s.recv(65536)
        if not chunk:
            break
        data += chunk
    s.close()
    t.join(timeout=60)
    assert not t.is_alive()

    lines = [json.loads(l) for l in data.decode().splitlines()]
    kinds = [l["type"] for l in lines]
    assert kinds[-1] == "summary" and "probs" in kinds
    assert lines[-1]["n_output_frames"] > 0


def test_serve_tcp_survives_client_reset(tmp_path, rng):
    """A client that aborts mid-stream (TCP RST) must not take the daemon
    down: the next connection is served normally."""
    import socket
    import struct
    import threading
    import time

    cfg = _tiny_cfg()
    _, params, state = _init(cfg)
    art = export_serving(cfg, params, state, platforms=("cpu",))
    art_path = str(tmp_path / "model.sedart")
    art.save(art_path)

    probe = socket.socket()
    probe.bind(("127.0.0.1", 0))
    port = probe.getsockname()[1]
    probe.close()

    t = threading.Thread(
        target=serve_main,
        args=([
            "--artifact", art_path, "--pcm", "f32le", "--listen", str(port),
            "--connections", "2", "--threshold", "0.5",
        ],),
        daemon=True,
    )
    t.start()

    def connect():
        for _ in range(200):
            try:
                return socket.create_connection(("127.0.0.1", port),
                                                timeout=0.5)
            except OSError:
                time.sleep(0.05)
        raise AssertionError("server never started listening")

    sr = cfg.frontend.sample_rate
    pcm = (0.1 * rng.standard_normal(sr)).astype(np.float32)

    # Connection 1: send a few bytes, then abort with RST (SO_LINGER 0).
    s1 = connect()
    s1.sendall(pcm[:1000].tobytes())
    s1.setsockopt(socket.SOL_SOCKET, socket.SO_LINGER,
                  struct.pack("ii", 1, 0))
    s1.close()

    # Connection 2: the normal flow still completes.
    s2 = connect()
    s2.settimeout(120)
    s2.sendall(pcm.tobytes())
    s2.shutdown(socket.SHUT_WR)
    data = b""
    while True:
        chunk = s2.recv(65536)
        if not chunk:
            break
        data += chunk
    s2.close()
    t.join(timeout=60)
    assert not t.is_alive()

    lines = [json.loads(l) for l in data.decode().splitlines()]
    assert lines and lines[-1]["type"] == "summary"
    assert lines[-1]["n_output_frames"] > 0


def test_serve_cli_rejects_nonpositive_input_rate(tmp_path, rng):
    """--input-rate 0/-1 must fail at parse time (argparse error), not
    lazily at the first chunk — in --listen mode the lazy ValueError would
    crash the keep-alive daemon."""
    cfg = _tiny_cfg()
    _, params, state = _init(cfg)
    art = export_serving(cfg, params, state, platforms=("cpu",))
    art_path = str(tmp_path / "model.sedart")
    art.save(art_path)
    for bad in ("0", "-16000"):
        with pytest.raises(SystemExit):
            serve_main(["--artifact", art_path, "--pcm", "f32le",
                        "--input-rate", bad])


def test_batched_worker_matches_single_stream(tmp_path, rng):
    """Three concurrent streams through one BatchedStepWorker must each
    reproduce the single-stream serve_stream output exactly: the batched
    program is a vmap of the single step, and host-side slot select must
    never leak one stream's carry into another."""
    import threading

    from sed_crnn_tpu.apps.serve import BatchedStepWorker

    cfg = _tiny_cfg()
    _, params, state = _init(cfg)
    art = export_serving(cfg, params, state, platforms=("cpu",))

    sr = cfg.frontend.sample_rate
    streams = [
        (0.1 * rng.standard_normal(sr * 2)).astype(np.float32)
        for _ in range(3)
    ]

    def run(pcm, stepper=None):
        lines = []
        n_out, _ = serve_stream(
            art, _random_packets(pcm, np.random.default_rng(0)),
            lines.append, threshold=0.5, emit_probs=True, stepper=stepper,
        )
        probs = np.concatenate(
            [np.asarray(l["probs"]) for l in lines if l["type"] == "probs"]
        )
        return probs

    want = [run(pcm) for pcm in streams]

    worker = BatchedStepWorker(art, capacity=3)
    got = [None] * 3

    def client(i):
        got[i] = run(streams[i], stepper=worker.stepper())

    threads = [threading.Thread(target=client, args=(i,)) for i in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    worker.shutdown()

    for i in range(3):
        np.testing.assert_array_equal(got[i], want[i])
    assert worker.stepped == sum(len(w) for w in want) // int(
        art.meta["seq_len_out"]
    )


def test_batched_worker_slot_reuse_resets_state(tmp_path, rng):
    """Back-to-back streams on a reused slot must behave like fresh
    single-stream runs (acquire zeroes the slot's carry)."""
    from sed_crnn_tpu.apps.serve import BatchedStepWorker

    cfg = _tiny_cfg()
    _, params, state = _init(cfg)
    art = export_serving(cfg, params, state, platforms=("cpu",))
    sr = cfg.frontend.sample_rate
    pcm = (0.1 * rng.standard_normal(sr)).astype(np.float32)

    def run(stepper):
        lines = []
        serve_stream(art, iter([pcm]), lines.append, threshold=0.5,
                     emit_probs=True, stepper=stepper)
        return np.concatenate(
            [np.asarray(l["probs"]) for l in lines if l["type"] == "probs"]
        )

    worker = BatchedStepWorker(art, capacity=1)
    # The stepper's owner must release its slot (as the daemon's handler
    # does in its finally) — with capacity=1 an unreleased slot blocks the
    # next acquire forever. Exactly that leak made this test deadlock the
    # whole suite before round 5.
    s1 = worker.stepper()
    first = run(s1)
    s1.close()
    s2 = worker.stepper()  # same slot, must not inherit carry
    second = run(s2)
    s2.close()
    worker.shutdown()
    np.testing.assert_array_equal(first, second)


def test_serve_cli_tcp_batched_concurrent_clients(tmp_path, rng):
    """--max-streams 3: three clients connected AT THE SAME TIME each get
    their own correct stream back, and summaries carry step latency."""
    import socket
    import threading
    import time

    cfg = _tiny_cfg()
    _, params, state = _init(cfg)
    art = export_serving(cfg, params, state, platforms=("cpu",))
    art_path = str(tmp_path / "model.sedart")
    art.save(art_path)

    probe = socket.socket()
    probe.bind(("127.0.0.1", 0))
    port = probe.getsockname()[1]
    probe.close()

    t = threading.Thread(
        target=serve_main,
        args=([
            "--artifact", art_path, "--pcm", "f32le", "--listen", str(port),
            "--connections", "3", "--max-streams", "3",
            "--emit", "both", "--threshold", "0.5",
        ],),
        daemon=True,
    )
    t.start()

    sr = cfg.frontend.sample_rate
    streams = [
        (0.1 * np.random.default_rng(100 + i).standard_normal(sr)).astype(
            np.float32
        )
        for i in range(3)
    ]

    # single-stream oracle per client
    def oracle(pcm):
        lines = []
        serve_stream(art, iter([pcm]), lines.append, threshold=0.5,
                     emit_probs=True)
        return np.concatenate(
            [np.asarray(l["probs"]) for l in lines if l["type"] == "probs"]
        )

    want = [oracle(pcm) for pcm in streams]

    socks = []
    for _ in range(200):
        try:
            socks.append(socket.create_connection(("127.0.0.1", port),
                                                  timeout=0.5))
            break
        except OSError:
            time.sleep(0.05)
    assert socks, "server never started listening"
    socks += [socket.create_connection(("127.0.0.1", port), timeout=5)
              for _ in range(2)]
    results = [None] * 3

    def client(i):
        s = socks[i]
        s.settimeout(120)
        s.sendall(streams[i].tobytes())
        s.shutdown(socket.SHUT_WR)
        data = b""
        while True:
            chunk = s.recv(65536)
            if not chunk:
                break
            data += chunk
        s.close()
        results[i] = [json.loads(l) for l in data.decode().splitlines()]

    cthreads = [threading.Thread(target=client, args=(i,)) for i in range(3)]
    for ct in cthreads:
        ct.start()
    for ct in cthreads:
        ct.join()
    t.join(timeout=60)
    assert not t.is_alive()

    for i in range(3):
        lines = results[i]
        summary = [l for l in lines if l["type"] == "summary"][0]
        assert summary["n_output_frames"] > 0
        assert "step_ms_p50" in summary and "step_ms_p99" in summary
        got = np.concatenate(
            [np.asarray(l["probs"]) for l in lines if l["type"] == "probs"]
        )
        np.testing.assert_array_equal(got, want[i])


def test_serve_cli_max_streams_flag_validation(tmp_path, rng):
    cfg = _tiny_cfg()
    _, params, state = _init(cfg)
    art = export_serving(cfg, params, state, platforms=("cpu",))
    art_path = str(tmp_path / "model.sedart")
    art.save(art_path)
    # --max-streams without --listen
    with pytest.raises(SystemExit):
        serve_main(["--artifact", art_path, "--pcm", "f32le",
                    "--max-streams", "4"])
    # batched + lookahead
    with pytest.raises(SystemExit):
        serve_main(["--artifact", art_path, "--pcm", "f32le",
                    "--listen", "0", "--max-streams", "4", "--lookahead"])
    with pytest.raises(SystemExit):
        serve_main(["--artifact", art_path, "--pcm", "f32le",
                    "--listen", "0", "--max-streams", "0"])


def test_batched_worker_death_propagates_not_hangs():
    """A worker-thread failure must surface to clients as an exception —
    a silently dead worker leaves every client blocked in reply.get() and
    the daemon's accept loop in join() forever (observed once under heavy
    host contention). Clients get the error; later submits and acquires
    fail fast."""
    from sed_crnn_tpu.apps.serve import BatchedStepWorker

    class Boom(RuntimeError):
        pass

    class FakeArt:
        meta = {"seq_len_in": 4, "n_mels": 3, "in_channels": 1}

        def stream_init_batch(self, b):
            return [np.zeros((b, 2), np.float32)]

        def stream_step_batch(self, carry, chunks):
            raise Boom("kernel exploded")

    w = BatchedStepWorker(FakeArt(), capacity=2)
    s = w.stepper()
    with pytest.raises(RuntimeError, match="died"):
        s.step(np.zeros((4, 3), np.float32))
    with pytest.raises(RuntimeError, match="shut down"):
        w.submit(0, np.zeros((4, 3), np.float32))
    with pytest.raises(RuntimeError, match="shut down"):
        w.acquire()
    w.shutdown()
