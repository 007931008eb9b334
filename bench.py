"""Headline benchmark: end-to-end audio-hours/sec per chip for the
feature-extraction + training pipeline (the BASELINE.json metric), measured
on real hardware, with the CPU reference implementation (numpy/scipy frontend
+ torch CRNN, i.e. what the reference repo runs) measured inline as the
baseline denominator.

Prints exactly ONE JSON line on stdout:
  {"metric": ..., "value": N, "unit": "audio-hours/sec", "vs_baseline": N}
"""

import json
import sys
import time

import numpy as np

FRAMES_PER_SEC = 44100 / 1024.0
WINDOW = 64
BATCH = 128


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _tone(seconds, sr=44100, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(int(seconds * sr)) / sr
    return (
        0.3 * np.sin(2 * np.pi * 440 * t)
        + 0.1 * np.sin(2 * np.pi * 2310 * t)
        + 0.02 * rng.standard_normal(t.size)
    ).astype(np.float32)


def bench_tpu():
    import jax

    from sed_crnn_tpu.core.runtime import enable_compilation_cache, use_fast_prng

    use_fast_prng()
    cache_dir = enable_compilation_cache()
    log(f"compilation cache: {cache_dir or 'disabled'}")
    import jax.numpy as jnp

    from sed_crnn_tpu.core.config import FrontendConfig, get_preset
    from sed_crnn_tpu.data import rasterize
    from sed_crnn_tpu.ops.frontend import log_mel_energies
    from sed_crnn_tpu.train.loop import Trainer, make_samplers
    from sed_crnn_tpu.models import get_model

    dev = jax.devices()[0]
    log(f"device: {dev}")

    # NOTE on timing: under the axon remote-TPU platform,
    # `block_until_ready` resolves before the computation actually retires,
    # so every measurement below forces a host materialization of a value
    # that depends on the full computation. Host<->device transfers ride a
    # slow tunnel, so inputs stay modest (~40 MB) and the repetition loop
    # runs ON DEVICE (fori_loop with a per-iteration input perturbation that
    # defeats loop-invariant hoisting) to amortize the ~30 ms roundtrip.

    # ---- frontend throughput: audio-seconds featurized per second --------
    audio_sec = 240.0
    reps_on_device = 100  # amortize the ~33 ms tunnel RTT well below the ms-scale kernel time
    # Per-rep multiplicative perturbation defeats loop-invariant hoisting;
    # it fuses into the frontend's first pass over the waveform, so it is
    # effectively free (cycling resident waveforms by dynamic index measured
    # SLOWER — the row gather cannot fuse).
    wav = jnp.asarray(_tone(audio_sec))
    best_feat_rate = 0.0
    for backend in ("fft", "matmul", "pallas"):
        cfg = FrontendConfig(backend=backend)

        @jax.jit
        def fn(y, c=cfg):
            def body(i, acc):
                m = log_mel_energies(y * (1.0 + 1e-7 * i), c)
                return acc + jnp.sum(m)

            return jax.lax.fori_loop(0, reps_on_device, body, 0.0)

        float(fn(wav))  # compile + warm
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(fn(wav))
            times.append(time.perf_counter() - t0)
        dt = min(times) / reps_on_device
        rate = audio_sec / dt
        log(f"frontend[{backend}]: {dt*1e3:.2f} ms / {audio_sec:.0f}s audio "
            f"-> {rate:,.0f} audio-sec/sec")
        best_feat_rate = max(best_feat_rate, rate)

    # ---- train-step throughput: audio-seconds trained per second ---------
    # v1 model (conv 128) on balanced windows, full jitted epoch scan, with
    # the bfloat16 conv trunk (GRU recurrence stays f32; loss trajectories
    # match f32 — see commit history for the measured comparison).
    import dataclasses

    exp = get_preset("timepooled-v1")
    exp = exp.replace(model=dataclasses.replace(exp.model, compute_dtype="bfloat16"))
    frames = 120000
    rng = np.random.default_rng(1)
    mel = rng.standard_normal((frames, 40)).astype(np.float32)
    events = [(t, t + 0.3) for t in np.arange(2.0, frames / FRAMES_PER_SEC - 3, 2.0)]
    lab = rasterize.rasterize_events(events, frames, 44100, 1024)
    fold = {"train_x": mel, "train_y": lab, "val_x": mel[:20000], "val_y": lab[:20000]}
    train_sampler, val_sampler = make_samplers(exp, fold)
    trainer = Trainer(get_model(exp.model), exp.train, train_sampler, val_sampler)
    state = trainer.init_state(jax.random.PRNGKey(0))

    n_steps = 200

    # Steady-state pipelined training, as run_fold dispatches it: epoch k+1
    # is queued before epoch k's scores are read, so the chip never idles
    # through host logic. Measured here as a chain of epochs with ONE host
    # fetch at the end (each separate float() fetch would pay a full ~33 ms
    # tunnel roundtrip that pipelining hides in real training).
    chain = 3

    def run_epochs(state, seed0):
        scores = None
        for r in range(chain):
            state, scores = trainer.train_epoch(
                state, jax.random.PRNGKey(seed0 + r), n_steps
            )
        # force full materialization: the fused scalar depends on every
        # chained step's loss and on the final optimizer update
        _ = float(scores["loss"] + jnp.sum(state.params["head"][0]["b"]))
        return state

    state = run_epochs(state, 1)  # compile + warm
    times = []
    for r in range(3):
        t0 = time.perf_counter()
        state = run_epochs(state, 10 + chain * r)
        times.append(time.perf_counter() - t0)
    dt = min(times) / chain
    audio_per_epoch = n_steps * BATCH * WINDOW / FRAMES_PER_SEC
    train_rate = audio_per_epoch / dt
    log(f"train: {chain}x {n_steps} steps x {BATCH} windows, {dt*1e3:.1f} ms/epoch "
        f"-> {train_rate:,.0f} audio-sec/sec")

    # ---- multi-seed training: the README's "mean of 5 runs" protocol as
    # one stacked program (train/multiseed.py). Measures the aggregate
    # throughput of 4 concurrent runs vs 4x the single-run cost — the
    # protocol-level speedup a reference user gets for their headline
    # numbers. Guarded: must never cost the headline metric. -------------
    try:
        from sed_crnn_tpu.train.multiseed import MultiSeedTrainer

        n_seeds = 4
        ms_trainer = MultiSeedTrainer(
            trainer.model, exp.train, train_sampler, val_sampler, n_seeds
        )
        ms_keys = jnp.stack([jax.random.PRNGKey(11 + i) for i in range(n_seeds)])
        ms_state = ms_trainer.init_states(ms_keys)

        def run_ms_epochs(state, seed0):
            scores = None
            for r in range(chain):
                keys = jnp.stack(
                    [jax.random.PRNGKey(seed0 + r + 97 * i) for i in range(n_seeds)]
                )
                state, scores = ms_trainer.train_epoch(state, keys, n_steps)
            _ = float(
                jnp.sum(scores["loss"])
                + jnp.sum(state.params["head"][0]["b"])
            )
            return state

        ms_state = run_ms_epochs(ms_state, 1)  # compile + warm
        times = []
        for r in range(3):
            t0 = time.perf_counter()
            ms_state = run_ms_epochs(ms_state, 40 + chain * r)
            times.append(time.perf_counter() - t0)
        ms_dt = min(times) / chain
        ms_rate = n_seeds * audio_per_epoch / ms_dt
        log(f"multiseed x{n_seeds} stacked: {ms_dt*1e3:.1f} ms/epoch "
            f"-> {ms_rate:,.0f} audio-sec/sec aggregate "
            f"({ms_rate/train_rate:.2f}x the single-run rate)")

        # SEQUENTIAL mode — what `--runs-mode auto` picks for this conv-128
        # config on one chip (train/multiseed.py:476-503): N independent
        # states through the SAME compiled single-run epoch program, one
        # after another, one host fetch at the end.
        seq_states = [
            trainer.init_state(jax.random.PRNGKey(50 + i))
            for i in range(n_seeds)
        ]

        def run_seq(seed0):
            losses = []
            for i in range(n_seeds):
                s = seq_states[i]
                for r in range(chain):
                    s, sc = trainer.train_epoch(
                        s, jax.random.PRNGKey(seed0 + r + 31 * i), n_steps
                    )
                seq_states[i] = s
                losses.append(sc["loss"])
            _ = float(jnp.sum(jnp.stack(losses)))

        run_seq(1)  # settle (the epoch program is already compiled)
        t0 = time.perf_counter()
        run_seq(60)
        seq_dt = time.perf_counter() - t0
        ms_seq_rate = n_seeds * chain * audio_per_epoch / seq_dt
        ms_auto_mode = "sequential" if ms_seq_rate > ms_rate else "stacked"
        log(f"multiseed x{n_seeds} sequential: {seq_dt/ (n_seeds*chain) * 1e3:.1f} "
            f"ms/epoch -> {ms_seq_rate:,.0f} audio-sec/sec aggregate; "
            f"auto mode picks '{ms_auto_mode}' "
            f"({max(ms_seq_rate, ms_rate)/min(ms_seq_rate, ms_rate):.2f}x win)")
    except Exception as e:  # pragma: no cover - defensive
        log(f"multiseed bench FAILED (non-fatal): {e!r}")
        ms_rate = ms_seq_rate = 0.0
        ms_auto_mode = "unknown"

    # ---- flagship SEDnet: 256-frame sequence training (the reference's
    # headline workflow, README.md:55-58) -------------------------------
    from sed_crnn_tpu.data.rasterize import rasterize_events

    # bf16 conv trunk, same justification as v1 above (the reference's
    # 'medium' matmul precision); scripts/sednet_bf16_ab.py measured 1.71x
    # with loss trajectories matching f32 to 1e-4 over 6 epochs. The GRU
    # recurrence runs the Pallas kernel (gru_backend auto on TPU) in f32.
    exp_s = get_preset("sednet-dcase")
    exp_s = exp_s.replace(
        model=dataclasses.replace(exp_s.model, compute_dtype="bfloat16")
    )
    frames_s = 60_000
    ev = [(t, t + 0.4, int(t) % 6) for t in np.arange(3.0, frames_s / FRAMES_PER_SEC - 5, 4.0)]
    lab_s = rasterize_events(
        [(s, e) for s, e, _ in ev], frames_s, 44100, 1024,
        n_classes=6, class_ids=[c for _, _, c in ev],
    )
    mel_s = rng.standard_normal((frames_s, 40)).astype(np.float32)
    fold_s = {
        "train_x": mel_s, "train_y": lab_s,
        "val_x": mel_s[:20000], "val_y": lab_s[:20000],
    }
    ts_s, vs_s = make_samplers(exp_s, fold_s)
    trainer_s = Trainer(get_model(exp_s.model), exp_s.train, ts_s, vs_s)
    state_s = trainer_s.init_state(jax.random.PRNGKey(2))
    sed_steps = 20
    t0 = time.perf_counter()
    state_s, sc = trainer_s.train_epoch(state_s, jax.random.PRNGKey(3), sed_steps)
    _ = float(sc["loss"])
    sed_compile = time.perf_counter() - t0
    log(f"sednet first epoch (compile + run): {sed_compile:.1f}s")

    def run_sed_epochs(state, seed0):
        scores = None
        for r in range(chain):
            state, scores = trainer_s.train_epoch(
                state, jax.random.PRNGKey(seed0 + r), sed_steps
            )
        _ = float(scores["loss"] + jnp.sum(state.params["head"][0]["b"]))
        return state

    state_s = run_sed_epochs(state_s, 5)  # warm
    times = []
    for r in range(3):
        t0 = time.perf_counter()
        state_s = run_sed_epochs(state_s, 30 + chain * r)
        times.append(time.perf_counter() - t0)
    sed_dt = min(times) / chain
    sed_audio = sed_steps * 128 * 256 / FRAMES_PER_SEC
    sed_rate = sed_audio / sed_dt
    log(f"sednet train: {sed_steps} steps x 128 seq256, {sed_dt*1e3:.1f} ms/epoch "
        f"-> {sed_rate:,.0f} audio-sec/sec")

    # ---- serving: streaming inference throughput on the flagship --------
    # Long-recording chunked-scan inference with carried GRU state (the
    # serving path of apps/infer.py), flagship SEDnet, 40 min of audio per
    # call. Calls are queued back to back with ONE host fetch at the end,
    # as a serving loop would pipeline them.
    from sed_crnn_tpu.models.streaming import stream_logits

    model_s = trainer_s.model
    stream_frames = 103_000  # ~40 min at 43 fps
    mel_long = jnp.asarray(rng.standard_normal((stream_frames, 40)), jnp.float32)
    stream_reps = 8

    def run_stream(tag):
        acc = 0.0
        for r in range(stream_reps):
            logits = stream_logits(
                model_s, state_s.params, state_s.model_state,
                mel_long * (1.0 + 1e-7 * (tag + r)), False,
            )
            acc = acc + jnp.sum(logits)
        return float(acc)

    # Guarded: a failure in the serving-side extra must never cost the
    # headline pipeline metric.
    try:
        run_stream(0)  # compile + warm
        times = []
        for r in range(3):
            t0 = time.perf_counter()
            run_stream(100 * (r + 1))
            times.append(time.perf_counter() - t0)
        stream_dt = min(times) / stream_reps
        stream_audio = stream_frames / FRAMES_PER_SEC
        stream_rate = stream_audio / stream_dt
        log(f"sednet streaming infer: {stream_dt*1e3:.1f} ms / {stream_audio:.0f}s audio "
            f"-> {stream_rate:,.0f} audio-sec/sec")
    except Exception as e:  # pragma: no cover - defensive
        log(f"sednet streaming infer FAILED (non-fatal): {e!r}")
        stream_rate = 0.0

    # ---- batched streaming serving: B concurrent live streams through ONE
    # one-chunk device program — the `sedtpu-serve --max-streams B` daemon's
    # device path (BatchedStepWorker), measured artifact-free on the live
    # model. Pipelined = device-resident carries, one fetch (the
    # apples-to-apples comparison against the equally pipelined train rate);
    # sync = fetch probabilities every tick, what the daemon actually pays
    # per tick including the axon tunnel round trip. The exported-artifact
    # and live-TCP numbers are recorded in docs/SERVING.md
    # (scripts/bench_serving.py). --------------------------------------
    from functools import partial

    from sed_crnn_tpu.nn.layers import Ctx

    batched_stream = {}
    bs_sync_p50 = bs_sync_p99 = 0.0
    try:
        from sed_crnn_tpu.models.streaming import _zero_carry

        params_b, mstate_b = state_s.params, state_s.model_state
        t_in = exp_s.model.seq_len_in
        chunk_audio = t_in / FRAMES_PER_SEC

        @partial(jax.jit, donate_argnums=(0,))
        def step_batch(carry, chunks):
            # BATCH-NATIVE apply: the model's forward takes (B, T, F) and a
            # (B, H)-leaved carry directly. (vmap of a per-example apply
            # serializes the Pallas GRU kernel per stream — measured 61 ms
            # at B=128 vs ~6 ms batch-native.)
            logits, _, nc = model_s.apply(
                params_b, mstate_b, chunks, Ctx(train=False), rnn_carry=carry
            )
            new_carry = [  # causal: backward state re-zeroes per chunk
                {"fwd": c["fwd"], "bwd": jnp.zeros_like(c["bwd"])}
                for c in nc
            ]
            return new_carry, jax.nn.sigmoid(logits)

        bs_chain = 8
        for B in (8, 32, 128):
            chunks = jnp.asarray(
                rng.standard_normal((B, t_in, 40)), jnp.float32
            )
            carry = _zero_carry(
                trainer_s.model, params_b, mstate_b, t_in, batch=B
            )
            carry, probs = step_batch(carry, chunks)  # compile
            float(jnp.sum(probs))

            def run_bs(carry):
                acc = 0.0
                for _ in range(bs_chain):
                    carry, probs = step_batch(carry, chunks)
                    acc = acc + jnp.sum(probs)
                return carry, float(acc)

            carry, _ = run_bs(carry)  # settle
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                carry, _ = run_bs(carry)
                times.append(time.perf_counter() - t0)
            step_dt = min(times) / bs_chain
            batched_stream[B] = B * chunk_audio / step_dt
            log(f"batched stream B={B}: {step_dt*1e3:.2f} ms/step -> "
                f"{batched_stream[B]:,.0f} audio-sec/sec aggregate "
                f"({batched_stream[B]/sed_rate:.1f}x the train rate)")
            if B == 32:  # daemon-tick latency: one host fetch per tick
                lat = []
                for _ in range(20):
                    t0 = time.perf_counter()
                    carry, probs = step_batch(carry, chunks)
                    _ = np.asarray(probs)
                    lat.append(time.perf_counter() - t0)
                lat_ms = np.asarray(lat) * 1e3
                bs_sync_p50 = float(np.percentile(lat_ms, 50))
                bs_sync_p99 = float(np.percentile(lat_ms, 99))
                log(f"batched stream B=32 sync tick: p50 {bs_sync_p50:.1f} ms "
                    f"p99 {bs_sync_p99:.1f} ms")
    except Exception as e:  # pragma: no cover - defensive
        log(f"batched streaming bench FAILED (non-fatal): {e!r}")

    pipeline_rate = 1.0 / (1.0 / best_feat_rate + 1.0 / train_rate)
    return {
        "pipeline_rate": pipeline_rate,
        "feat_rate": best_feat_rate,
        "train_rate": train_rate,
        "sed_rate": sed_rate,
        "sed_compile": sed_compile,
        "stream_rate": stream_rate,
        "ms_rate": ms_rate,
        "ms_seq_rate": ms_seq_rate,
        "ms_auto_mode": ms_auto_mode,
        "batched_stream": batched_stream,
        "bs_sync_p50_ms": bs_sync_p50,
        "bs_sync_p99_ms": bs_sync_p99,
        "cache_dir": cache_dir,
    }


def bench_cpu_reference():
    """The reference's stack: scipy/numpy log-mel + torch CRNN train step,
    single process (as the reference runs on CPU), measured on short samples
    and expressed in the same audio-sec/sec unit."""
    import scipy.fft
    import torch

    # frontend: librosa-semantics numpy implementation on 10 s of audio
    audio_sec = 10.0
    y = _tone(audio_sec).astype(np.float64)
    n_fft, hop = 2048, 1024
    win = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(n_fft) / n_fft)
    from sed_crnn_tpu.ops.mel import mel_filterbank

    fb = mel_filterbank(44100, n_fft, 40, dtype=np.float64)

    def cpu_frontend_once():
        t0 = time.perf_counter()
        ypad = np.pad(y, n_fft // 2, mode="reflect")
        n_frames = 1 + (len(ypad) - n_fft) // hop
        frames = np.lib.stride_tricks.sliding_window_view(ypad, n_fft)[::hop][:n_frames]
        spec = np.abs(scipy.fft.rfft(frames * win, axis=1)) ** 2
        _ = np.log(spec @ fb.T)
        return time.perf_counter() - t0

    # warm scipy's FFT plan/caches, then take the median of 5 (single-core
    # host timing swings ~30% with load; one sample made vs_baseline noisy)
    cpu_frontend_once()
    feat_dt = float(np.median([cpu_frontend_once() for _ in range(5)]))
    feat_rate = audio_sec / feat_dt
    log(f"cpu frontend: {feat_dt*1e3:.1f} ms / {audio_sec:.0f}s -> {feat_rate:,.0f} audio-sec/sec")

    # train step: v1-equivalent torch model, one fwd+bwd+Adam step, batch 16
    torch.manual_seed(0)
    conv = []
    in_c = 1
    for _ in range(3):
        conv += [torch.nn.Conv2d(in_c, 128, 3, padding=1), torch.nn.BatchNorm2d(128),
                 torch.nn.ReLU(), torch.nn.MaxPool2d((1, 2))]
        in_c = 128
    trunk = torch.nn.Sequential(*conv)
    gru = torch.nn.GRU(128 * 40, 32, num_layers=2, batch_first=True, bidirectional=True)
    fc = torch.nn.Linear(64, 1)
    params = list(trunk.parameters()) + list(gru.parameters()) + list(fc.parameters())
    opt = torch.optim.Adam(params, lr=1e-3)
    lossf = torch.nn.BCEWithLogitsLoss()

    b = 16
    x = torch.randn(b, 1, 40, WINDOW)
    yt = (torch.rand(b, 8, 1) > 0.5).float()
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        opt.zero_grad()
        h = trunk(x).permute(0, 3, 1, 2).reshape(b, 8, -1)
        out = fc(gru(h)[0])
        loss = lossf(out, yt)
        loss.backward()
        opt.step()
        times.append(time.perf_counter() - t0)
    step_dt = float(np.median(times[1:]))  # drop the warmup rep, median of 4
    train_rate = b * WINDOW / FRAMES_PER_SEC / step_dt
    log(f"cpu train: {step_dt*1e3:.1f} ms / {b} windows -> {train_rate:,.0f} audio-sec/sec")

    return 1.0 / (1.0 / feat_rate + 1.0 / train_rate)


# Calibrated CPU-reference denominator: median of 9 back-to-back
# bench_cpu_reference() runs on this box with no other load
# (scripts/calibrate_baseline.py, 2026-08-21: median 39.5, min 32.0,
# max 46.3). The LIVE denominator swung 21.0-54.6 audio-sec/sec across
# rounds 1-4 (BENCH_r0{1..4}.json) purely with box load while the TPU
# numerator moved 1.6%, so the headline multiplier is pinned against this
# constant; a >2x deviation of the live measurement from it flags a
# loaded box.
CPU_BASELINE_CALIBRATED = 39.5  # audio-sec/sec; scripts/calibrate_baseline.py


def main():
    r = bench_tpu()
    cpu_rate = bench_cpu_reference()
    tpu_rate = r["pipeline_rate"]
    deviation = max(cpu_rate, CPU_BASELINE_CALIBRATED) / max(
        1e-9, min(cpu_rate, CPU_BASELINE_CALIBRATED)
    )
    if deviation > 2.0:
        log(f"WARNING: live CPU baseline {cpu_rate:.1f} deviates {deviation:.1f}x "
            f"from the calibrated {CPU_BASELINE_CALIBRATED:.1f} audio-sec/sec "
            f"(loaded box?) — prefer vs_baseline_calibrated")
    result = {
        "metric": "feature+train pipeline throughput (timepooled CRNN, 40-mel frontend)",
        "value": round(tpu_rate / 3600.0, 3),
        "unit": "audio-hours/sec",
        "vs_baseline": round(tpu_rate / CPU_BASELINE_CALIBRATED, 2),
        "detail": {
            "tpu_frontend_audio_sec_per_sec": round(r["feat_rate"], 1),
            "tpu_train_audio_sec_per_sec": round(r["train_rate"], 1),
            "cpu_reference_audio_sec_per_sec_live": round(cpu_rate, 1),
            "cpu_reference_audio_sec_per_sec_calibrated": CPU_BASELINE_CALIBRATED,
            "vs_baseline_live": round(tpu_rate / cpu_rate, 2),
            "sednet256_train_audio_sec_per_sec": round(r["sed_rate"], 1),
            "sednet256_first_epoch_compile_sec": round(r["sed_compile"], 1),
            "compile_cache_dir": r["cache_dir"],
            "sednet256_streaming_infer_audio_sec_per_sec": round(
                r["stream_rate"], 1
            ),
            "multiseed4_v1_stacked_audio_sec_per_sec": round(r["ms_rate"], 1),
            "multiseed4_v1_sequential_audio_sec_per_sec": round(
                r["ms_seq_rate"], 1
            ),
            "multiseed4_v1_auto_mode": r["ms_auto_mode"],
            "batched_stream_audio_sec_per_sec": {
                str(b): round(v, 1) for b, v in r["batched_stream"].items()
            },
            "batched_stream32_sync_tick_ms_p50": round(r["bs_sync_p50_ms"], 2),
            "batched_stream32_sync_tick_ms_p99": round(r["bs_sync_p99_ms"], 2),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
