"""Name the B=256 spill: per-op device profile of the v1 train step at
B=128 vs B=256.

Round-2 measured inverse batch scaling on the v1 epoch program (B=128
3.23 ms/step -> B=256 8.08 -> B=512 17.1, docs/ROADMAP.md) and asserted
"larger batches spill" without a profile. Round-3 decomposed it first
(/tmp recheck runs, recorded in ROADMAP): with the default threefry PRNG
the program scales LINEARLY (6.37/6.60/6.84 ms per 128 windows at
B=128/256/512); only the rbg fast-PRNG program (what bench/apps use,
`core/runtime.py::use_fast_prng`) degrades per window (3.67/4.30/4.44 —
+17% at B=256). This script therefore profiles the rbg program — pass
--no-fast-prng for the threefry baseline — capturing `jax.profiler.trace`
at both batch sizes, aggregating device-stream op durations by HLO name,
and printing the ops whose cost grows superlinearly (>2.2x for a 2x
batch).

Run (fresh process, real TPU):
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_batch_spill.py
"""

import argparse
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


def run_epoch(batch, steps=50):
    import dataclasses

    from sed_crnn_tpu.core.config import get_preset
    from sed_crnn_tpu.data import rasterize
    from sed_crnn_tpu.models import get_model
    from sed_crnn_tpu.train.loop import Trainer, make_samplers

    exp = get_preset("timepooled-v1")
    exp = exp.replace(
        model=dataclasses.replace(exp.model, compute_dtype="bfloat16"),
        train=exp.train.__class__(**{**exp.train.__dict__, "batch_size": batch}),
    )
    frames = 120_000
    rng = np.random.default_rng(1)
    mel = rng.standard_normal((frames, 40)).astype(np.float32)
    events = [(t, t + 0.3) for t in np.arange(2.0, frames / 43.066 - 3, 2.0)]
    lab = rasterize.rasterize_events(events, frames, 44100, 1024)
    fold = {"train_x": mel, "train_y": lab, "val_x": mel[:20000], "val_y": lab[:20000]}
    ts, vs = make_samplers(exp, fold)
    trainer = Trainer(get_model(exp.model), exp.train, ts, vs)
    state = trainer.init_state(jax.random.PRNGKey(0))

    # compile + warm
    state, sc = trainer.train_epoch(state, jax.random.PRNGKey(1), steps)
    _ = float(sc["loss"])
    t0 = time.perf_counter()
    state, sc = trainer.train_epoch(state, jax.random.PRNGKey(2), steps)
    _ = float(sc["loss"])
    wall = time.perf_counter() - t0

    trace_dir = f"/tmp/spill_trace_b{batch}"
    os.makedirs(trace_dir, exist_ok=True)
    with jax.profiler.trace(trace_dir):
        state, sc = trainer.train_epoch(state, jax.random.PRNGKey(3), steps)
        _ = float(sc["loss"])
    return wall / steps, trace_dir


def device_op_totals(trace_dir):
    """Aggregate device-stream event durations (us) by op name."""
    paths = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    if not paths:
        raise RuntimeError(f"no trace under {trace_dir}")
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # pid -> process name; device streams carry 'TPU' in the name
    pid_name = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_name[e["pid"]] = e["args"].get("name", "")
    device_pids = {p for p, n in pid_name.items() if "TPU" in n or "/device" in n}
    totals = defaultdict(float)
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in device_pids:
            totals[e.get("name", "?")] += e.get("dur", 0.0)
    return totals


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--no-fast-prng", action="store_true",
                    help="profile the threefry baseline instead of the rbg "
                         "fast-PRNG program that bench/apps run")
    args = ap.parse_args()
    if not args.no_fast_prng:
        from sed_crnn_tpu.core.runtime import use_fast_prng

        use_fast_prng()
    log(f"device: {jax.devices()[0]}  prng={'threefry' if args.no_fast_prng else 'rbg'}")
    res = {}
    for batch in (128, 256):
        per_step, trace_dir = run_epoch(batch)
        totals = device_op_totals(trace_dir)
        res[batch] = (per_step, totals)
        log(f"B={batch}: {per_step*1e3:.2f} ms/step, "
            f"{len(totals)} device ops, "
            f"total device time {sum(totals.values())/1e3:.1f} ms")

    t128, t256 = res[128][1], res[256][1]
    rows = []
    for name, us256 in t256.items():
        us128 = t128.get(name, 0.0)
        ratio = us256 / us128 if us128 > 0 else float("inf")
        rows.append((us256, us128, ratio, name))
    rows.sort(reverse=True)

    print(json.dumps({
        "ms_per_step": {"128": round(res[128][0] * 1e3, 3),
                        "256": round(res[256][0] * 1e3, 3)},
        "top_ops_b256": [
            {"name": n[:120], "us_b256": round(a, 1), "us_b128": round(b, 1),
             "ratio": (round(r, 2) if r != float("inf") else "new")}
            for a, b, r, n in rows[:25]
        ],
        "superlinear": [
            {"name": n[:120], "us_b256": round(a, 1), "us_b128": round(b, 1),
             "ratio": (round(r, 2) if r != float("inf") else "new")}
            for a, b, r, n in rows if (r > 2.2 or r == float("inf")) and a > 500
        ][:25],
    }, indent=2))


if __name__ == "__main__":
    main()
