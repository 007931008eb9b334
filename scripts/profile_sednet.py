"""Decompose the flagship SEDnet (256-frame) train step on real TPU.

BENCH_r02/r03 put the sednet-dcase epoch at ~22 ms/step (34k audio-sec/sec)
— per audio-second ~2.5x slower than the v1 64-frame step. The suspect is
the recurrence: 2 biGRU layers x 2 directions x 256 timesteps = 1024
sequential (128,32)@(32,96)-class GEMMs per step, latency-bound on the MXU,
plus the grad-of-scan backward. This script measures, all in ONE process
(tunnel discipline):

  1. steady-state full train epoch per-step time (the bench number);
  2. forward-only model time;
  3. the isolated GRU stack at sednet shapes (B=128, T=256, feat=256),
     forward and forward+backward;
  4. the isolated conv trunk forward+backward;
  5. a per-op device trace of the train epoch, top ops by total time.

Run (fresh process, real TPU, run_in_background, NO tight timeout):
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_sednet.py
"""

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


def timed(fn, *args, reps=3):
    """fn must return a scalar-reducible value; host-materialize to time."""
    _ = float(fn(*args))  # compile + warm
    times = []
    for _i in range(reps):
        t0 = time.perf_counter()
        _ = float(fn(*args))
        times.append(time.perf_counter() - t0)
    return min(times)


def main():
    from sed_crnn_tpu.core.runtime import use_fast_prng

    use_fast_prng()
    log(f"device: {jax.devices()[0]}")

    from sed_crnn_tpu.core.config import get_preset
    from sed_crnn_tpu.data.rasterize import rasterize_events
    from sed_crnn_tpu.models import get_model
    from sed_crnn_tpu.nn.gru import BiGRU
    from sed_crnn_tpu.nn.layers import Ctx
    from sed_crnn_tpu.train.loop import Trainer, make_samplers

    results = {}
    R = 50  # on-device reps for sub-programs (amortize ~33 ms tunnel RTT)

    # ---- isolated GRU stack at sednet shapes -------------------------
    B, T, FEAT, H = 128, 256, 256, 32
    g1 = BiGRU(FEAT, H, reset_after=False, gate_activation="hard_sigmoid")
    g2 = BiGRU(2 * H, H, reset_after=False, gate_activation="hard_sigmoid")
    k = jax.random.PRNGKey(0)
    gp = {"g1": g1.init(k), "g2": g2.init(jax.random.fold_in(k, 1))}
    x_gru = jax.random.normal(jax.random.fold_in(k, 2), (B, T, FEAT), jnp.float32)

    def gru_fwd_loss(p, x):
        y, _ = g1.apply(p["g1"], x)
        y, _ = g2.apply(p["g2"], y)
        return jnp.sum(y * y)

    @jax.jit
    def gru_fwd_loop(p, x):
        def body(i, acc):
            return acc + gru_fwd_loss(p, x * (1.0 + 1e-7 * i))

        return jax.lax.fori_loop(0, R, body, 0.0)

    @jax.jit
    def gru_bwd_loop(p, x):
        def body(i, acc):
            g = jax.grad(gru_fwd_loss)(p, x * (1.0 + 1e-7 * i))
            return acc + sum(jnp.sum(v) for v in jax.tree_util.tree_leaves(g))

        return jax.lax.fori_loop(0, R, body, 0.0)

    dt = timed(gru_fwd_loop, gp, x_gru) / R
    results["gru_stack_fwd_ms"] = dt * 1e3
    log(f"gru stack fwd: {dt*1e3:.2f} ms")
    dt = timed(gru_bwd_loop, gp, x_gru) / R
    results["gru_stack_fwdbwd_ms"] = dt * 1e3
    log(f"gru stack fwd+bwd: {dt*1e3:.2f} ms")

    # ---- scan unroll sweep at T=256 ----------------------------------
    for unroll in (4, 16):
        g1u = BiGRU(FEAT, H, reset_after=False, gate_activation="hard_sigmoid",
                    unroll=unroll)
        g2u = BiGRU(2 * H, H, reset_after=False, gate_activation="hard_sigmoid",
                    unroll=unroll)

        def gru_u_loss(p, x, g1u=g1u, g2u=g2u):
            y, _ = g1u.apply(p["g1"], x)
            y, _ = g2u.apply(p["g2"], y)
            return jnp.sum(y * y)

        @jax.jit
        def gru_u_fwd(p, x, gru_u_loss=gru_u_loss):
            def body(i, acc):
                return acc + gru_u_loss(p, x * (1.0 + 1e-7 * i))

            return jax.lax.fori_loop(0, R, body, 0.0)

        @jax.jit
        def gru_u_bwd(p, x, gru_u_loss=gru_u_loss):
            def body(i, acc):
                g = jax.grad(gru_u_loss)(p, x * (1.0 + 1e-7 * i))
                return acc + sum(jnp.sum(v) for v in jax.tree_util.tree_leaves(g))

            return jax.lax.fori_loop(0, R, body, 0.0)

        dt = timed(gru_u_fwd, gp, x_gru) / R
        results[f"gru_stack_fwd_unroll{unroll}_ms"] = dt * 1e3
        log(f"gru stack fwd (unroll={unroll}): {dt*1e3:.2f} ms")
        dt = timed(gru_u_bwd, gp, x_gru) / R
        results[f"gru_stack_fwdbwd_unroll{unroll}_ms"] = dt * 1e3
        log(f"gru stack fwd+bwd (unroll={unroll}): {dt*1e3:.2f} ms")

    # ---- pallas single-kernel recurrence -----------------------------
    g1p = BiGRU(FEAT, H, reset_after=False, gate_activation="hard_sigmoid",
                backend="pallas")
    g2p = BiGRU(2 * H, H, reset_after=False, gate_activation="hard_sigmoid",
                backend="pallas")

    def gru_p_loss(p, x):
        y, _ = g1p.apply(p["g1"], x)
        y, _ = g2p.apply(p["g2"], y)
        return jnp.sum(y * y)

    @jax.jit
    def gru_p_fwd(p, x):
        def body(i, acc):
            return acc + gru_p_loss(p, x * (1.0 + 1e-7 * i))

        return jax.lax.fori_loop(0, R, body, 0.0)

    @jax.jit
    def gru_p_bwd(p, x):
        def body(i, acc):
            g = jax.grad(gru_p_loss)(p, x * (1.0 + 1e-7 * i))
            return acc + sum(jnp.sum(v) for v in jax.tree_util.tree_leaves(g))

        return jax.lax.fori_loop(0, R, body, 0.0)

    # numerical sanity on-device before timing
    ref_val = float(jax.jit(gru_fwd_loss)(gp, x_gru))
    pal_val = float(jax.jit(gru_p_loss)(gp, x_gru))
    log(f"pallas vs xla loss: {pal_val:.6f} vs {ref_val:.6f} "
        f"(rel {abs(pal_val-ref_val)/abs(ref_val):.2e})")
    results["pallas_vs_xla_rel_err"] = abs(pal_val - ref_val) / abs(ref_val)

    dt = timed(gru_p_fwd, gp, x_gru) / R
    results["gru_stack_fwd_pallas_ms"] = dt * 1e3
    log(f"gru stack fwd (pallas): {dt*1e3:.2f} ms")
    dt = timed(gru_p_bwd, gp, x_gru) / R
    results["gru_stack_fwdbwd_pallas_ms"] = dt * 1e3
    log(f"gru stack fwd+bwd (pallas): {dt*1e3:.2f} ms")

    # ---- full model fwd / fwd+bwd, xla-scan vs pallas recurrence ------
    import dataclasses

    exp = get_preset("sednet-dcase")
    x_in = jax.random.normal(jax.random.fold_in(k, 4), (B, T, 40), jnp.float32)
    y_in = (jax.random.uniform(jax.random.fold_in(k, 5), (B, T, 6)) > 0.9).astype(
        jnp.float32
    )

    for backend in ("xla", "pallas"):
        mcfg = dataclasses.replace(exp.model, gru_backend=backend)
        model = get_model(mcfg)
        params, mstate = model.init(jax.random.PRNGKey(3))

        def model_loss(p, s, x, y, key, model=model):
            ctx = Ctx(train=True, rng=key)
            logits, ns, _ = model.apply(p, s, x, ctx)
            z = logits
            loss = jnp.mean(
                jnp.maximum(z, 0) - z * y + jnp.log1p(jnp.exp(-jnp.abs(z)))
            )
            return loss, ns

        @jax.jit
        def model_fwd_loop(p, s, x, y, model_loss=model_loss):
            def body(i, acc):
                l, _ = model_loss(p, s, x * (1.0 + 1e-7 * i), y, jax.random.PRNGKey(7))
                return acc + l

            return jax.lax.fori_loop(0, R, body, 0.0)

        @jax.jit
        def model_bwd_loop(p, s, x, y, model_loss=model_loss):
            def body(i, acc):
                g, _ = jax.grad(model_loss, has_aux=True)(
                    p, s, x * (1.0 + 1e-7 * i), y, jax.random.PRNGKey(7)
                )
                return acc + sum(jnp.sum(v) for v in jax.tree_util.tree_leaves(g))

            return jax.lax.fori_loop(0, R, body, 0.0)

        dt = timed(model_fwd_loop, params, mstate, x_in, y_in) / R
        results[f"model_fwd_{backend}_ms"] = dt * 1e3
        log(f"model fwd [{backend}]: {dt*1e3:.2f} ms")
        dt = timed(model_bwd_loop, params, mstate, x_in, y_in) / R
        results[f"model_fwdbwd_{backend}_ms"] = dt * 1e3
        log(f"model fwd+bwd [{backend}]: {dt*1e3:.2f} ms")

    # ---- full train epoch (the bench program) ------------------------
    frames_s = 60_000
    FRAMES_PER_SEC = 44100 / 1024.0
    ev = [
        (t, t + 0.4, int(t) % 6)
        for t in np.arange(3.0, frames_s / FRAMES_PER_SEC - 5, 4.0)
    ]
    lab_s = rasterize_events(
        [(s, e) for s, e, _ in ev],
        frames_s,
        44100,
        1024,
        n_classes=6,
        class_ids=[c for _, _, c in ev],
    )
    rng = np.random.default_rng(1)
    mel_s = rng.standard_normal((frames_s, 40)).astype(np.float32)
    fold_s = {
        "train_x": mel_s,
        "train_y": lab_s,
        "val_x": mel_s[:20000],
        "val_y": lab_s[:20000],
    }
    ts_s, vs_s = make_samplers(exp, fold_s)
    steps = 50
    for backend in ("xla", "pallas"):
        mcfg = dataclasses.replace(exp.model, gru_backend=backend)
        trainer = Trainer(get_model(mcfg), exp.train, ts_s, vs_s)
        state = trainer.init_state(jax.random.PRNGKey(2))
        state, sc = trainer.train_epoch(state, jax.random.PRNGKey(5), steps)
        _ = float(sc["loss"])  # compile + warm
        times = []
        for r in range(3):
            t0 = time.perf_counter()
            state, sc = trainer.train_epoch(state, jax.random.PRNGKey(6 + r), steps)
            _ = float(sc["loss"])
            times.append(time.perf_counter() - t0)
        per_step = min(times) / steps
        results[f"train_epoch_{backend}_ms_per_step"] = per_step * 1e3
        log(f"train epoch [{backend}]: {per_step*1e3:.2f} ms/step")

    # ---- per-op trace of the (last = pallas) epoch --------------------
    trace_dir = "/tmp/sednet_trace"
    os.makedirs(trace_dir, exist_ok=True)
    with jax.profiler.trace(trace_dir):
        state, sc = trainer.train_epoch(state, jax.random.PRNGKey(9), steps)
        _ = float(sc["loss"])

    paths = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    top = []
    if paths:
        path = max(paths, key=os.path.getmtime)
        with gzip.open(path, "rt") as f:
            trace = json.load(f)
        events = trace.get("traceEvents", [])
        pid_name = {}
        for e in events:
            if e.get("ph") == "M" and e.get("name") == "process_name":
                pid_name[e["pid"]] = e["args"].get("name", "")
        device_pids = {p for p, n in pid_name.items() if "TPU" in n or "/device" in n}
        totals = defaultdict(float)
        counts = defaultdict(int)
        for e in events:
            if e.get("ph") == "X" and e.get("pid") in device_pids:
                totals[e.get("name", "?")] += e.get("dur", 0.0)
                counts[e.get("name", "?")] += 1
        rows = sorted(totals.items(), key=lambda kv: -kv[1])
        top = [
            {
                "name": n[:100],
                "total_us": round(us, 1),
                "count": counts[n],
                "us_per_step": round(us / steps, 1),
            }
            for n, us in rows[:40]
        ]
        dev_total = sum(totals.values())
        results["device_total_ms_per_step"] = dev_total / steps / 1e3
        log(f"device total: {dev_total/steps/1e3:.2f} ms/step over {len(totals)} ops")

    print(json.dumps({"results": {k: round(v, 3) for k, v in results.items()},
                      "top_ops": top}, indent=2))


if __name__ == "__main__":
    main()
