"""Real-time serving daemon: a live PCM stream in, detections out, from an
AOT artifact alone.

The offline apps decode a whole recording before inferring; this is the
LIVE path — arbitrary-size PCM packets (a microphone, a socket, ffmpeg's
stdout) enter a streaming framer (`utils/native.py`, C++ with a numpy
fallback), complete frames become log-mel rows
(`ops/frontend.py::log_mel_from_frames`), and every ``seq_len_in`` frames
one `stream_step` of the artifact advances the carried GRU state and emits
frame probabilities. Events open and close online: one JSON line per
completed event as soon as its offset is known (plus per-chunk probability
lines with ``--emit probs|both``). Normalization and weights live inside
the artifact's programs; the wav/PCM bytes and the ``.sedart`` file are the
only inputs. Matches the offline pipeline bit-for-near (chain parity pinned
in `tests/test_export.py::test_realtime_chain_matches_offline` and
`tests/test_serve.py`).

  ffmpeg -i rtsp://cam -f f32le -ac 1 -ar 44100 - | \
      sedtpu-serve --artifact model.sedart --pcm f32le
  sedtpu-serve --artifact model.sedart --wav recording.wav
  sedtpu-serve --artifact model.sedart --pcm s16le --listen 7700  # TCP

``--listen PORT`` accepts TCP connections on localhost instead of reading
stdin: each connection streams PCM in and receives its own JSON lines
back on the same socket (fresh model state per connection; loop with
--connections N or 0 = forever). ``--max-streams B`` upgrades the daemon
to CONCURRENT serving: up to B clients at once, their chunks gathered
each tick into one ``stream_step_batch`` device program
(`BatchedStepWorker`) so N clients cost one device dispatch per tick
instead of N sequential ones; summaries report per-step latency
p50/p99. Measured batched throughput/latency: docs/SERVING.md.
"""

from __future__ import annotations

import argparse
import json
import queue
import sys
import threading
import time

import numpy as np

from sed_crnn_tpu.data.eventio import default_class_names


def pcm_chunks_from_stream(stream, fmt: str = "f32le", chunk_bytes: int = 65536):
    """Byte stream -> float32 PCM chunks. ``f32le`` passes through;
    ``s16le`` scales by 1/32768. Carries split samples across reads."""
    width = 4 if fmt == "f32le" else 2
    if fmt not in ("f32le", "s16le"):
        raise ValueError(f"unknown pcm format {fmt!r}: use f32le or s16le")
    pending = b""
    while True:
        data = stream.read(chunk_bytes)
        if not data:
            break
        data = pending + data
        usable = len(data) - len(data) % width
        pending = data[usable:]
        if not usable:
            continue
        if fmt == "f32le":
            yield np.frombuffer(data[:usable], "<f4").astype(np.float32)
        else:
            yield np.frombuffer(data[:usable], "<i2").astype(np.float32) / 32768.0


def resampled_chunks(chunks, sr_in: int, sr_out: int):
    """Adapt a PCM chunk stream at ``sr_in`` to ``sr_out`` on the fly via the
    carried-history polyphase resampler (`data/resample.py`) — lets 16 k/48 k
    clients feed a 44.1 k artifact live. Seam-free: the concatenated output
    equals offline resampling of the whole stream."""
    from sed_crnn_tpu.data.resample import StreamingResampler

    rs = StreamingResampler(sr_in, sr_out)
    for chunk in chunks:
        out = rs.push(chunk)
        if out.size:
            yield out
    tail = rs.flush()
    if tail.size:
        yield tail


def pcm_chunks_from_wav(path: str, sr: int, chunk_samples: int = 8192):
    from sed_crnn_tpu.data.wavio import decode_audio

    pcm = decode_audio(path, sr=sr, mono=True)
    for i in range(0, len(pcm), chunk_samples):
        yield pcm[i : i + chunk_samples]


class OnlineEventDecoder:
    """Threshold-crossing event tracker over streamed probability chunks:
    emits each event once, the moment its offset frame arrives (or at
    end-of-stream for events still open)."""

    def __init__(self, n_classes: int, frame_hop_s: float, threshold):
        self.thr = np.broadcast_to(
            np.asarray(threshold, np.float32), (n_classes,)
        ).copy()
        self.hop_s = frame_hop_s
        self.open = [None] * n_classes  # onset frame index per class
        self.frame = 0

    def push(self, probs: np.ndarray):
        """(frames, n_classes) probabilities -> completed events
        ``(onset_s, offset_s, class)``."""
        done = []
        active = np.asarray(probs) > self.thr[None, :]
        for row in active:
            for c, a in enumerate(row):
                if a and self.open[c] is None:
                    self.open[c] = self.frame
                elif not a and self.open[c] is not None:
                    done.append(
                        (self.open[c] * self.hop_s, self.frame * self.hop_s, c)
                    )
                    self.open[c] = None
            self.frame += 1
        return done

    def finish(self):
        done = [
            (s * self.hop_s, self.frame * self.hop_s, c)
            for c, s in enumerate(self.open)
            if s is not None
        ]
        self.open = [None] * len(self.open)
        return done


class _DirectStepper:
    """Single-stream stepping straight through the artifact's programs —
    the default path; owns the carried RNN state and per-step latency."""

    def __init__(self, artifact):
        self.art = artifact
        self.carry = artifact.stream_init()
        self.latencies = []

    def step(self, chunk):
        t0 = time.perf_counter()
        self.carry, probs = self.art.stream_step(self.carry, chunk)
        probs = np.asarray(probs)
        self.latencies.append(time.perf_counter() - t0)
        return probs

    def step_lookahead(self, chunk_pair):
        t0 = time.perf_counter()
        self.carry, probs = self.art.stream_step_lookahead(
            self.carry, chunk_pair
        )
        probs = np.asarray(probs)
        self.latencies.append(time.perf_counter() - t0)
        return probs

    def close(self):
        pass


class BatchedStepWorker:
    """Multiplexes up to ``capacity`` concurrent live streams through ONE
    ``stream_step_batch`` device program (`models/export.py`).

    Each connection owns a slot; its handler thread submits one log-mel
    chunk at a time and blocks for that slot's probabilities. A single
    worker thread gathers whatever chunks are pending, zero-pads the
    inactive slots, runs the batched step, and scatters results back —
    so N clients cost one device dispatch per tick instead of N. The
    carry tree lives on the HOST (numpy): RNN carries are a few KB per
    stream, and host-side slot select/reset avoids extra device programs
    (inactive slots keep their carry; a freshly acquired slot is zeroed).
    """

    def __init__(self, artifact, capacity: int):
        import jax

        if capacity < 1:
            raise ValueError(f"capacity must be >= 1, got {capacity}")
        self.art = artifact
        self.capacity = capacity
        meta = artifact.meta
        self._chunk_shape = (
            int(meta["seq_len_in"]),
            int(meta["n_mels"]) * int(meta["in_channels"]),
        )
        # writable host copies (np.asarray of a jax array may be read-only)
        self.carry = jax.tree.map(
            lambda a: np.array(a), artifact.stream_init_batch(capacity)
        )
        self._tree = jax.tree
        self._free = list(range(capacity))
        self._pending = {}  # slot -> (chunk, reply SimpleQueue)
        self._cv = threading.Condition()
        self._stop = False
        self._error: Exception | None = None
        self.ticks = 0
        self.stepped = 0
        self._thread = threading.Thread(
            target=self._run, name="sedtpu-batch-step", daemon=True
        )
        self._thread.start()

    def stepper(self) -> "_SlotStepper":
        return _SlotStepper(self)

    def acquire(self) -> int:
        with self._cv:
            while not self._free and not self._stop:
                self._cv.wait()
            if self._stop:
                raise RuntimeError(
                    "batched step worker is shut down"
                ) from self._error
            slot = self._free.pop()
            for leaf in self._tree.leaves(self.carry):
                leaf[slot] = 0  # fresh stream state
            return slot

    def release(self, slot: int) -> None:
        with self._cv:
            self._pending.pop(slot, None)
            self._free.append(slot)
            self._cv.notify_all()

    def submit(self, slot: int, chunk: np.ndarray) -> np.ndarray:
        reply: "queue.SimpleQueue" = queue.SimpleQueue()
        with self._cv:
            if self._stop:
                raise RuntimeError(
                    "batched step worker is shut down"
                ) from self._error
            self._pending[slot] = (np.asarray(chunk, np.float32), reply)
            self._cv.notify_all()
        out = reply.get()
        # A worker-thread failure is delivered as the exception itself so no
        # client ever blocks forever on a dead worker (a silent worker death
        # deadlocked the whole daemon: clients in reply.get(), accept loop in
        # join — observed once under heavy host contention).
        if isinstance(out, BaseException):
            raise RuntimeError("batched step worker died") from out
        return out

    def shutdown(self) -> None:
        with self._cv:
            self._stop = True
            self._cv.notify_all()
        self._thread.join(timeout=10)

    def _run(self) -> None:
        try:
            self._loop()
        except BaseException as e:  # deliver, never die silently
            with self._cv:
                self._error = e
                self._stop = True
                pending = dict(self._pending)
                self._pending.clear()
                self._cv.notify_all()
            for _, reply in pending.values():
                reply.put(e)

    def _loop(self) -> None:
        zero = np.zeros(self._chunk_shape, np.float32)
        while True:
            with self._cv:
                while not self._pending and not self._stop:
                    self._cv.wait()
                if self._stop:
                    return
                batch = dict(self._pending)
                self._pending.clear()
            slots = sorted(batch)
            try:
                chunks = np.stack(
                    [
                        batch[s][0] if s in batch else zero
                        for s in range(self.capacity)
                    ]
                )
                new_carry, probs = self.art.stream_step_batch(
                    self.carry, chunks
                )
                probs = np.asarray(probs)
                new_leaves = [
                    np.asarray(l) for l in self._tree.leaves(new_carry)
                ]
            except BaseException as e:
                for s in slots:  # this tick's clients get the error too
                    batch[s][1].put(e)
                raise
            idx = np.asarray(slots)
            with self._cv:
                for old, new in zip(self._tree.leaves(self.carry), new_leaves):
                    old[idx] = new[idx]  # inactive slots keep their carry
            self.ticks += 1
            self.stepped += len(slots)
            for s in slots:
                batch[s][1].put(probs[s])


class _SlotStepper:
    """One stream's view of a `BatchedStepWorker` slot."""

    def __init__(self, worker: BatchedStepWorker):
        self.worker = worker
        self.slot = worker.acquire()
        self.latencies = []

    def step(self, chunk):
        t0 = time.perf_counter()
        probs = self.worker.submit(self.slot, chunk)
        self.latencies.append(time.perf_counter() - t0)
        return probs

    def step_lookahead(self, chunk_pair):
        raise ValueError(
            "lookahead is unsupported in batched serving mode — it holds "
            "chunks across ticks; serve lookahead streams single-stream"
        )

    def close(self):
        self.worker.release(self.slot)


def serve_stream(
    artifact,
    pcm_chunks,
    emit,
    threshold=None,
    log_floor: float = 1e-10,
    emit_probs: bool = False,
    emit_events: bool = True,
    lookahead: bool = False,
    stepper=None,
):
    """Drive the live chain; calls ``emit(dict)`` per output line. Returns
    ``(n_output_frames, n_events)``.

    ``lookahead=True`` holds each chunk until its successor arrives and
    runs the artifact's pair steps instead — bounded bidirectional right
    context at one extra chunk of latency, reproducing the offline
    ``artifact.stream(lookahead=True)`` output."""
    import dataclasses

    from sed_crnn_tpu.core.config import FrontendConfig
    from sed_crnn_tpu.ops.frontend import log_mel_from_frames
    from sed_crnn_tpu.utils.native import make_framer

    from sed_crnn_tpu.apps.infer import _threshold_arg

    meta = artifact.meta
    if int(meta.get("in_channels", 1)) != 1:
        raise ValueError(
            f"live serving is single-channel; the artifact was exported with "
            f"in_channels={meta['in_channels']} — serve binaural recordings "
            f"offline with sedtpu-infer --artifact"
        )
    fcfg = FrontendConfig(**meta["frontend"])
    if log_floor:
        fcfg = dataclasses.replace(fcfg, log_floor=float(log_floor))
    n_classes = int(meta["n_classes"])
    chunk_frames = int(meta["seq_len_in"])
    pool = chunk_frames // int(meta["seq_len_out"])
    out_hop_s = fcfg.hop_length * pool / fcfg.sample_rate
    if threshold is None:
        threshold = meta.get("default_threshold")
        if threshold is None:
            threshold = 0.5
    threshold = _threshold_arg(threshold, n_classes)

    framer = make_framer(fcfg.n_fft, fcfg.hop_length, fcfg.center)
    decoder = OnlineEventDecoder(n_classes, out_hop_s, threshold)
    if stepper is None:
        stepper = _DirectStepper(artifact)
    buf = np.empty((0, fcfg.n_mels), np.float32)
    n_out = n_events = chunk_i = 0

    pending = None  # lookahead: the chunk awaiting its right context

    def run_chunk(chunk, keep_frames, right=None):
        nonlocal n_out, n_events, chunk_i
        if right is None:
            probs = stepper.step(chunk)
        else:
            probs = stepper.step_lookahead(
                np.concatenate([chunk, right], axis=0)
            )
        probs = probs[:keep_frames]
        n_out += probs.shape[0]
        if emit_probs and probs.shape[0]:
            emit({"type": "probs", "chunk": chunk_i,
                  "probs": np.round(probs, 5).tolist()})
        if emit_events:
            for s, e, c in decoder.push(probs):
                n_events += 1
                emit({"type": "event", "start_s": round(s, 3),
                      "end_s": round(e, 3), "class": c})
        chunk_i += 1

    def consume(chunk, keep_frames):
        nonlocal pending
        if not lookahead:
            run_chunk(chunk, keep_frames)
        else:
            if pending is not None:
                run_chunk(pending[0], pending[1], right=chunk)
            pending = (chunk, keep_frames)

    def step_ready():
        nonlocal buf
        while buf.shape[0] >= chunk_frames:
            consume(buf[:chunk_frames], chunk_frames // pool)
            buf = buf[chunk_frames:]

    for pcm in pcm_chunks:
        frames = framer.feed(pcm)
        if frames.shape[0]:
            buf = np.concatenate(
                [buf, np.asarray(log_mel_from_frames(frames, fcfg))], axis=0
            )
        step_ready()
    # End of stream: the framer's right-pad tail frames, then the final
    # ragged chunk — zero-padded to a full chunk and trimmed to its true
    # output frames, exactly as the offline artifact.stream pads-and-trims —
    # then any still-open events (their offset is the stream end).
    frames = framer.flush()
    if frames.shape[0]:
        buf = np.concatenate(
            [buf, np.asarray(log_mel_from_frames(frames, fcfg))], axis=0
        )
    step_ready()
    # A ragged tail with < pool frames emits nothing itself, but under
    # lookahead it is still the held chunk's real right context — exactly
    # what offline padding provides — so form it whenever any frames remain.
    if buf.shape[0] >= (1 if lookahead else pool):
        tail = np.pad(buf, ((0, chunk_frames - buf.shape[0]), (0, 0)))
        consume(tail, buf.shape[0] // pool)
    if lookahead and pending is not None:
        run_chunk(pending[0], pending[1], right=np.zeros_like(pending[0]))
        pending = None
    if emit_events:
        for s, e, c in decoder.finish():
            n_events += 1
            emit({"type": "event", "start_s": round(s, 3),
                  "end_s": round(e, 3), "class": c, "open_at_eos": True})
    return n_out, n_events


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--artifact", required=True, help=".sedart from sedtpu-export")
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--pcm", choices=("f32le", "s16le"),
                     help="read raw mono PCM of this format from stdin "
                          "(at the artifact's frontend rate, or give "
                          "--input-rate to resample live)")
    src.add_argument("--wav", help="serve a wav file through the live chain")
    p.add_argument("--listen", type=int, metavar="PORT",
                   help="with --pcm: accept TCP connections on "
                        "localhost:PORT instead of reading stdin; JSON "
                        "lines return on the socket")
    p.add_argument("--host", default="127.0.0.1",
                   help="bind address for --listen")
    p.add_argument("--connections", type=int, default=1,
                   help="with --listen: serve N connections then exit "
                        "(0 = forever)")
    p.add_argument("--max-streams", type=int, default=1, metavar="B",
                   help="with --listen: serve up to B clients CONCURRENTLY, "
                        "multiplexed through one batched device program "
                        "(stream_step_batch); 1 = the classic one-at-a-time "
                        "loop")
    p.add_argument("--threshold", type=float, nargs="+", default=None,
                   help="one global value or one per class (default: the "
                        "artifact's baked-in operating points, else 0.5)")
    p.add_argument("--emit", choices=("events", "probs", "both"),
                   default="events")
    p.add_argument(
        "--input-rate", type=int, metavar="HZ",
        help="with --pcm: the incoming stream's sample rate; resampled "
             "live to the artifact's frontend rate when they differ",
    )
    p.add_argument(
        "--lookahead", action="store_true",
        help="hold each chunk one chunk for bounded bidirectional right "
             "context (better boundaries, +seq_len_in frames of latency)",
    )
    p.add_argument("--class-names",
                   help="comma-separated labels added to event lines")
    p.add_argument("--log-floor", type=float, default=1e-10)
    p.add_argument("--out", help="append JSON lines here (default stdout)")
    args = p.parse_args(argv)

    from sed_crnn_tpu.core.runtime import enable_compilation_cache

    enable_compilation_cache()

    from sed_crnn_tpu.models.export import ServingArtifact

    art = ServingArtifact.load(args.artifact)
    n_classes = int(art.meta["n_classes"])
    names = (
        tuple(args.class_names.split(","))
        if args.class_names
        else default_class_names(n_classes)
    )
    if len(names) != n_classes:
        p.error(f"{len(names)} class names for {n_classes} classes")
    threshold = None
    if args.threshold is not None:
        threshold = (
            args.threshold[0] if len(args.threshold) == 1
            else np.asarray(args.threshold, np.float32)
        )

    def make_emit(sink):
        def emit(obj):
            if obj.get("type") == "event":
                obj = {**obj, "label": names[obj["class"]]}
            sink.write(json.dumps(obj) + "\n")
            sink.flush()
        return emit

    art_sr = int(art.meta["frontend"]["sample_rate"])
    if args.input_rate is not None and not args.pcm:
        p.error("--input-rate applies to --pcm streams; wav files carry "
                "their own rate and are resampled automatically")
    # Validate at parse time: a zero/negative rate would otherwise raise
    # lazily inside StreamingResampler at the first chunk — in --listen mode
    # that ValueError escapes the per-connection (ConnectionError, OSError)
    # handler and takes the keep-alive daemon down with it.
    if args.input_rate is not None and args.input_rate <= 0:
        p.error("--input-rate must be a positive Hz value")

    def adapt_rate(chunks):
        if args.input_rate is None or args.input_rate == art_sr:
            return chunks
        return resampled_chunks(chunks, args.input_rate, art_sr)

    def run_one(chunks, emit, stepper=None):
        stepper = stepper if stepper is not None else _DirectStepper(art)
        n_out, n_events = serve_stream(
            art, chunks, emit, threshold, args.log_floor,
            emit_probs=args.emit in ("probs", "both"),
            emit_events=args.emit in ("events", "both"),
            lookahead=args.lookahead,
            stepper=stepper,
        )
        summary = {"type": "summary", "n_output_frames": n_out,
                   "n_events": n_events}
        if stepper.latencies:
            lat = np.asarray(stepper.latencies) * 1e3
            summary["step_ms_p50"] = round(float(np.percentile(lat, 50)), 2)
            summary["step_ms_p99"] = round(float(np.percentile(lat, 99)), 2)
        emit(summary)

    if args.max_streams < 1:
        p.error("--max-streams must be >= 1")
    if args.max_streams > 1 and args.listen is None:
        p.error("--max-streams applies to --listen daemons")
    if args.max_streams > 1 and args.lookahead:
        p.error("--lookahead is single-stream; drop it or --max-streams")

    if args.listen is not None:
        if not args.pcm:
            p.error("--listen requires --pcm FORMAT (raw PCM over TCP)")
        import socket

        srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        srv.bind((args.host, args.listen))
        srv.listen(max(8, args.max_streams))
        print(f"listening on {args.host}:{srv.getsockname()[1]}"
              + (f" (batched, up to {args.max_streams} concurrent streams)"
                 if args.max_streams > 1 else ""),
              file=sys.stderr, flush=True)

        def handle(conn, addr, stepper=None):
            # fresh carry/decoder per connection: each client is its own
            # independent stream; a client that resets mid-stream must not
            # take the daemon down with it
            with conn:
                rf = conn.makefile("rb")
                wf = conn.makefile("w")
                try:
                    run_one(adapt_rate(pcm_chunks_from_stream(rf, args.pcm)),
                            make_emit(wf), stepper)
                    wf.flush()
                except (ConnectionError, OSError) as e:
                    print(f"connection from {addr} dropped: {e!r}",
                          file=sys.stderr, flush=True)
                finally:
                    if stepper is not None:
                        stepper.close()

        served = 0
        try:
            if args.max_streams > 1:
                worker = BatchedStepWorker(art, args.max_streams)
                handlers = []
                while args.connections == 0 or served < args.connections:
                    conn, addr = srv.accept()
                    # slot acquisition happens inside the handler thread so
                    # a full house queues new clients instead of the accept
                    # loop blocking the live ones
                    t = threading.Thread(
                        target=lambda c=conn, a=addr: handle(
                            c, a, worker.stepper()
                        ),
                        daemon=True,
                    )
                    t.start()
                    handlers.append(t)
                    served += 1
                for t in handlers:
                    t.join()
                worker.shutdown()
                print(f"served {served} connections in "
                      f"{worker.ticks} batched ticks "
                      f"({worker.stepped} chunk steps)",
                      file=sys.stderr, flush=True)
            else:
                while args.connections == 0 or served < args.connections:
                    conn, addr = srv.accept()
                    handle(conn, addr)
                    served += 1
        finally:
            srv.close()
        return

    sink = open(args.out, "a") if args.out else sys.stdout
    if args.wav:
        chunks = pcm_chunks_from_wav(args.wav, art_sr)
    else:
        chunks = adapt_rate(pcm_chunks_from_stream(sys.stdin.buffer, args.pcm))
    run_one(chunks, make_emit(sink))
    if args.out:
        sink.close()


if __name__ == "__main__":
    main()
