"""Per-op device profile of the bf16-trunk SEDnet train epoch.

After the round-3 Pallas GRU + bf16 trunk, the flagship step is ~12 ms; the
conv math at bf16 should be ~2.5 ms at realized MXU efficiency, so several
ms of glue/fusion cost are unaccounted for. This captures a trace and
prints the top ops so the next optimization is named, not guessed (the
round-2 lesson: BN fusion splits and relayout copies are the usual
suspects at these activation sizes).

Run (fresh process, real TPU, run_in_background):
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_sednet_bf16.py
"""

import dataclasses
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

import numpy as np

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def device_op_totals(trace_dir):
    paths = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    pid_name = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_name[e["pid"]] = e["args"].get("name", "")
    device_pids = {p for p, n in pid_name.items() if "TPU" in n or "/device" in n}
    totals, counts = defaultdict(float), defaultdict(int)
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in device_pids:
            totals[e.get("name", "?")] += e.get("dur", 0.0)
            counts[e.get("name", "?")] += 1
    return totals, counts


def main():
    from sed_crnn_tpu.core.runtime import use_fast_prng

    use_fast_prng()
    log(f"device: {jax.devices()[0]}")

    from sed_crnn_tpu.core.config import get_preset
    from sed_crnn_tpu.data.rasterize import rasterize_events
    from sed_crnn_tpu.models import get_model
    from sed_crnn_tpu.train.loop import Trainer, make_samplers

    exp = get_preset("sednet-dcase")
    exp = exp.replace(
        model=dataclasses.replace(exp.model, compute_dtype="bfloat16")
    )
    FRAMES_PER_SEC = 44100 / 1024.0
    frames_s = 60_000
    rng = np.random.default_rng(1)
    ev = [
        (t, t + 0.4, int(t) % 6)
        for t in np.arange(3.0, frames_s / FRAMES_PER_SEC - 5, 4.0)
    ]
    lab_s = rasterize_events(
        [(s, e) for s, e, _ in ev], frames_s, 44100, 1024,
        n_classes=6, class_ids=[c for _, _, c in ev],
    )
    mel_s = rng.standard_normal((frames_s, 40)).astype(np.float32)
    fold_s = {
        "train_x": mel_s, "train_y": lab_s,
        "val_x": mel_s[:20000], "val_y": lab_s[:20000],
    }
    ts_s, vs_s = make_samplers(exp, fold_s)
    trainer = Trainer(get_model(exp.model), exp.train, ts_s, vs_s)
    state = trainer.init_state(jax.random.PRNGKey(2))
    steps = 50

    state, sc = trainer.train_epoch(state, jax.random.PRNGKey(5), steps)
    _ = float(sc["loss"])
    times = []
    for r in range(3):
        t0 = time.perf_counter()
        state, sc = trainer.train_epoch(state, jax.random.PRNGKey(6 + r), steps)
        _ = float(sc["loss"])
        times.append(time.perf_counter() - t0)
    per_step = min(times) / steps
    log(f"train epoch [bf16]: {per_step*1e3:.2f} ms/step")

    trace_dir = "/tmp/sednet_bf16_trace"
    os.makedirs(trace_dir, exist_ok=True)
    with jax.profiler.trace(trace_dir):
        state, sc = trainer.train_epoch(state, jax.random.PRNGKey(9), steps)
        _ = float(sc["loss"])
    totals, counts = device_op_totals(trace_dir)
    rows = sorted(totals.items(), key=lambda kv: -kv[1])
    # drop aggregate wrappers (the jit program / while loop spans)
    top = [
        {"name": n[:110], "us_per_step": round(us / steps, 1), "count": counts[n]}
        for n, us in rows
        if counts[n] >= steps // 2
    ][:45]
    print(json.dumps({
        "ms_per_step": round(per_step * 1e3, 3),
        "top_ops": top,
    }, indent=2))


if __name__ == "__main__":
    main()
