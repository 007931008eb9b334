"""Batched-serving measurement on real hardware: the numbers behind
docs/SERVING.md's throughput/latency table.

The reference has no serving path at all (`/root/reference/sed.py` and
`train_lightning.py` only train); this framework's serving story is the
`.sedart` artifact + `sedtpu-serve --max-streams B` daemon. This script
measures that story end to end on the TPU, in three stages:

  1. ``device_program`` — the exported ``stream_step_batch`` program at
     B in {8, 32, 128} concurrent streams, two ways:
       * PIPELINED: carries stay device-resident, steps chain, one host
         fetch at the end — the apples-to-apples throughput comparison
         against the (equally pipelined) training-step rate. If the batch
         axis works, aggregate audio-sec/sec must beat the train rate
         (same network, no backward pass).
       * SYNC TICK: each step fetches its probabilities to host before the
         next begins — exactly what `apps/serve.py::BatchedStepWorker` pays
         per tick (device time + axon tunnel round trip). Reported as
         per-tick p50/p99 latency and the daemon-mode aggregate rate.
  2. ``direct_jit`` — the same one-chunk batched step jitted directly from
     the checkpointed model (no artifact, TPU-native GRU backend): the
     ceiling a TPU-pinned serving host gets over the portable StableHLO.
  3. ``tcp_daemon`` — the real `sedtpu-serve --listen --max-streams 8`
     daemon driven by 8 genuinely concurrent TCP clients streaming PCM,
     after an identical warm-up wave (first-tick XLA compiles land in the
     warm-up, as they would in a long-lived daemon). Reports wall-clock
     aggregate and the clients' observed step p50/p99. NOTE: this stage
     exercises the HOST path too (TCP, framing, per-connection log-mel) on
     whatever box runs it — on the 1-CPU axon host it is host-bound, which
     is the point of measuring it separately from stage 1.

Prints one JSON line per stage and writes the collected results to
``--out`` (default /tmp/serving_bench.json).

  PYTHONPATH=/root/repo python scripts/bench_serving.py
"""

from __future__ import annotations

import argparse
import json
import os
import socket
import subprocess
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FRAMES_PER_SEC = 44100 / 1024.0


def _emit(line: dict, results: list):
    print(json.dumps(line), flush=True)
    results.append(line)


def build_artifact(path: str, compute_dtype: str = "bfloat16") -> None:
    """Export a flagship sednet-dcase artifact (random init — serving
    throughput does not depend on the weight values)."""
    import jax

    from sed_crnn_tpu.core.config import get_preset
    from sed_crnn_tpu.models import get_model
    from sed_crnn_tpu.models.export import export_serving

    cfg = get_preset("sednet-dcase")
    model = get_model(cfg.model)
    params, state = model.init(jax.random.PRNGKey(0))
    art = export_serving(
        cfg, params, state, norm_stats=None, preset="sednet-dcase",
        compute_dtype=compute_dtype,
    )
    art.save(path)


def bench_device_program(art_path: str, batch_sizes, results,
                         chain: int = 16, sync_ticks: int = 30):
    import jax
    import jax.numpy as jnp

    from sed_crnn_tpu.models.export import ServingArtifact

    art = ServingArtifact.load(art_path)
    t_in = int(art.meta["seq_len_in"])
    feat = int(art.meta["n_mels"]) * int(art.meta["in_channels"])
    chunk_audio = t_in / FRAMES_PER_SEC
    rng = np.random.default_rng(0)

    for B in batch_sizes:
        chunks = jnp.asarray(
            rng.standard_normal((B, t_in, feat)), jnp.float32
        )
        carry = art.stream_init_batch(B)

        # warm/compile (the symbolic-batch program still compiles one
        # executable per concrete B)
        carry, probs = art.stream_step_batch(carry, chunks)
        float(jnp.sum(probs))

        # -- pipelined: device-resident carry, one fetch ------------------
        def run_chain(carry):
            acc = 0.0
            for _ in range(chain):
                carry, probs = art.stream_step_batch(carry, chunks)
                acc = acc + jnp.sum(probs)
            return carry, float(acc)

        carry, _ = run_chain(carry)  # settle
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            carry, _ = run_chain(carry)
            times.append(time.perf_counter() - t0)
        step_dt = min(times) / chain
        pipelined_rate = B * chunk_audio / step_dt

        # -- sync tick: fetch probs every step (the daemon's pattern) -----
        lat = []
        host_carry = jax.tree.map(np.array, art.stream_init_batch(B))
        np_chunks = np.asarray(chunks)
        for _ in range(sync_ticks):
            t0 = time.perf_counter()
            host_carry, probs = art.stream_step_batch(host_carry, np_chunks)
            host_carry = jax.tree.map(np.asarray, host_carry)
            _ = np.asarray(probs)
            lat.append(time.perf_counter() - t0)
        lat_ms = np.asarray(lat) * 1e3
        sync_dt = float(np.median(lat))
        _emit({
            "stage": "device_program", "batch": B,
            "chunk_frames": t_in,
            "chunk_audio_sec": round(chunk_audio, 3),
            "pipelined_step_ms": round(step_dt * 1e3, 3),
            "pipelined_aggregate_audio_sec_per_sec": round(pipelined_rate, 1),
            "sync_tick_ms_p50": round(float(np.percentile(lat_ms, 50)), 2),
            "sync_tick_ms_p99": round(float(np.percentile(lat_ms, 99)), 2),
            "sync_aggregate_audio_sec_per_sec": round(
                B * chunk_audio / sync_dt, 1
            ),
        }, results)


def bench_direct_jit(batch_sizes, results, chain: int = 16):
    """The artifact-free TPU-native path: jit the one-chunk batched step on
    the live model (Pallas GRU on TPU where it fits) — what a TPU-pinned
    serving host can run when portability is not needed."""
    import dataclasses
    from functools import partial

    import jax
    import jax.numpy as jnp

    from sed_crnn_tpu.core.config import get_preset
    from sed_crnn_tpu.models import get_model
    from sed_crnn_tpu.models.streaming import _zero_carry
    from sed_crnn_tpu.nn.layers import Ctx

    cfg = get_preset("sednet-dcase")
    mcfg = dataclasses.replace(cfg.model, compute_dtype="bfloat16")
    model = get_model(mcfg)
    params, state = model.init(jax.random.PRNGKey(0))
    t_in = mcfg.seq_len_in
    feat = mcfg.n_mels * mcfg.in_channels
    chunk_audio = t_in / FRAMES_PER_SEC
    rng = np.random.default_rng(0)

    @partial(jax.jit, donate_argnums=(0,))
    def step_batch(carry, chunks):
        # BATCH-NATIVE apply: (B, T, F) chunks and (B, H)-leaved carries go
        # straight through the model — no vmap (vmap of a per-example apply
        # serializes the Pallas GRU kernel per stream: measured 61 ms at
        # B=128 vs ~6 ms batch-native).
        logits, _, nc = model.apply(
            params, state, chunks, Ctx(train=False), rnn_carry=carry
        )
        # causal streaming: backward state re-zeroes per chunk
        new_carry = [
            {"fwd": c["fwd"], "bwd": jnp.zeros_like(c["bwd"])} for c in nc
        ]
        return new_carry, jax.nn.sigmoid(logits)

    for B in batch_sizes:
        chunks = jnp.asarray(
            rng.standard_normal((B, t_in, feat)), jnp.float32
        )
        carry = _zero_carry(model, params, state, t_in, batch=B)
        carry, probs = step_batch(carry, chunks)  # compile
        float(jnp.sum(probs))

        def run_chain(carry):
            acc = 0.0
            for _ in range(chain):
                carry, probs = step_batch(carry, chunks)
                acc = acc + jnp.sum(probs)
            return carry, float(acc)

        carry, _ = run_chain(carry)
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            carry, _ = run_chain(carry)
            times.append(time.perf_counter() - t0)
        step_dt = min(times) / chain
        _emit({
            "stage": "direct_jit", "batch": B,
            "pipelined_step_ms": round(step_dt * 1e3, 3),
            "pipelined_aggregate_audio_sec_per_sec": round(
                B * chunk_audio / step_dt, 1
            ),
        }, results)


def _tone_pcm_s16(seconds: float, sr: int = 44100, seed: int = 0) -> bytes:
    rng = np.random.default_rng(seed)
    t = np.arange(int(seconds * sr)) / sr
    y = (
        0.3 * np.sin(2 * np.pi * 440 * t)
        + 0.1 * np.sin(2 * np.pi * 2310 * t)
        + 0.02 * rng.standard_normal(t.size)
    )
    return (np.clip(y, -1, 1) * 32767).astype("<i2").tobytes()


def _drive_client(port: int, pcm: bytes, out: dict, key):
    t0 = time.perf_counter()
    s = socket.create_connection(("127.0.0.1", port), timeout=600)
    try:
        f = s.makefile("rb")
        # stream in a writer thread while reading JSON lines back
        def write():
            try:
                view = memoryview(pcm)
                for i in range(0, len(pcm), 65536):
                    s.sendall(view[i:i + 65536])
                s.shutdown(socket.SHUT_WR)
            except OSError:
                pass

        w = threading.Thread(target=write, daemon=True)
        w.start()
        summary = None
        for line in f:
            obj = json.loads(line)
            if obj.get("type") == "summary":
                summary = obj
        w.join(timeout=60)
        out[key] = {
            "wall_sec": time.perf_counter() - t0,
            "summary": summary,
        }
    finally:
        s.close()


def bench_tcp_daemon(art_path: str, results, n_clients: int = 8,
                     audio_sec: float = 47.5, port: int = 7731):
    """Launch the real daemon (subprocess) with --max-streams n_clients and
    drive it with a warm-up wave then a measured wave of concurrent
    clients."""
    env = dict(os.environ)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    # warm-up wave + measured wave + the port-ready probe connection below
    total_conns = 2 * n_clients + 1
    proc = subprocess.Popen(
        [sys.executable, "-m", "sed_crnn_tpu.apps.serve",
         "--artifact", art_path, "--pcm", "s16le",
         "--listen", str(port), "--connections", str(total_conns),
         "--max-streams", str(n_clients)],
        env=env, stderr=subprocess.PIPE, text=True,
    )
    try:
        # wait for the listener
        deadline = time.time() + 600
        while time.time() < deadline:
            try:
                socket.create_connection(("127.0.0.1", port), timeout=1).close()
                break
            except OSError:
                if proc.poll() is not None:
                    raise RuntimeError(
                        f"daemon exited rc={proc.returncode}: "
                        f"{proc.stderr.read()[-2000:]}"
                    )
                time.sleep(0.5)
        # that probe connection consumed one slot of --connections; it sends
        # no PCM and EOFs immediately, costing one empty stream
        pcm = _tone_pcm_s16(audio_sec)

        def wave(tag):
            outs: dict = {}
            threads = [
                threading.Thread(
                    target=_drive_client, args=(port, pcm, outs, i),
                    daemon=True,
                )
                for i in range(n_clients)
            ]
            t0 = time.perf_counter()
            for t in threads:
                t.start()
            for t in threads:
                t.join(timeout=900)
            wall = time.perf_counter() - t0
            return outs, wall

        wave("warmup")  # compiles land here (minus the probe's slot)
        outs, wall = wave("measured")

        p50s = [o["summary"]["step_ms_p50"] for o in outs.values()
                if o.get("summary") and "step_ms_p50" in o["summary"]]
        p99s = [o["summary"]["step_ms_p99"] for o in outs.values()
                if o.get("summary") and "step_ms_p99" in o["summary"]]
        total_audio = n_clients * audio_sec
        _emit({
            "stage": "tcp_daemon", "n_clients": n_clients,
            "audio_sec_per_client": audio_sec,
            "wall_sec": round(wall, 2),
            "aggregate_audio_sec_per_sec": round(total_audio / wall, 1),
            "client_step_ms_p50_median": round(float(np.median(p50s)), 1)
            if p50s else None,
            "client_step_ms_p99_max": round(float(np.max(p99s)), 1)
            if p99s else None,
            "clients_completed": len(p50s),
        }, results)
    finally:
        try:
            proc.wait(timeout=120)
        except subprocess.TimeoutExpired:
            proc.kill()
            proc.wait()


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--artifact", default="/tmp/serving_bench.sedart")
    p.add_argument("--out", default="/tmp/serving_bench.json")
    p.add_argument("--batch-sizes", type=int, nargs="+",
                   default=[8, 32, 128])
    p.add_argument("--clients", type=int, default=8)
    p.add_argument("--client-audio-sec", type=float, default=47.5)
    p.add_argument("--port", type=int, default=7731)
    p.add_argument("--skip-tcp", action="store_true")
    p.add_argument("--skip-direct", action="store_true")
    args = p.parse_args(argv)

    import jax

    results: list = []
    _emit({"stage": "devices",
           "devices": [str(d) for d in jax.devices()]}, results)

    if not os.path.exists(args.artifact):
        t0 = time.time()
        build_artifact(args.artifact)
        _emit({"stage": "export",
               "artifact": args.artifact,
               "export_sec": round(time.time() - t0, 1)}, results)

    bench_device_program(args.artifact, args.batch_sizes, results)
    if not args.skip_direct:
        bench_direct_jit(args.batch_sizes, results)
    if not args.skip_tcp:
        bench_tcp_daemon(args.artifact, results, n_clients=args.clients,
                         audio_sec=args.client_audio_sec, port=args.port)

    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    _emit({"stage": "done", "out": args.out}, results)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
