"""One-process hardware batch: every pending on-TPU validation in one
session (the axon tunnel charges ~minutes of session startup per process,
so all TPU work batches here — see docs/ROADMAP.md "How to measure").

Stages:
  1. `scripts/serving_demo.py`     — wav corpus -> feature -> train ->
     streaming infer on a held-out recording -> event scores.
  2. AOT export check — export the demo's trained v1 checkpoint as a
     cpu+tpu serving artifact, run the TPU program, assert parity with the
     live model, time windowed + streaming serving.
  3. Multi-seed check — 4 concurrent v1 runs as one stacked program vs the
     single-run epoch (the `--runs N` protocol's hardware speedup).
  4. `scripts/flagship_binaural.py` — binaural 4-fold flagship training +
     jitted full-split eval (threshold sweep, segment + event metrics).

Prints one JSON line per stage (stages also print their own).

  python scripts/hw_batch_r3.py [--skip-binaural]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"
))


def export_check(work: str) -> dict:
    import jax
    import jax.numpy as jnp

    def jnp_sum(a):
        return jnp.sum(a)

    from sed_crnn_tpu.core import checkpoint as ckpt_io
    from sed_crnn_tpu.core.config import get_preset
    from sed_crnn_tpu.apps.infer import stats_from_fold
    from sed_crnn_tpu.models import get_model
    from sed_crnn_tpu.models.export import ServingArtifact, export_serving
    from sed_crnn_tpu.nn.layers import Ctx

    art_root = os.path.join(work, "art")
    run_dir = os.path.join(art_root, sorted(os.listdir(art_root))[-1])
    ckpt = os.path.join(run_dir, "fold1", "best_fold1.npz")
    cache = os.path.join(work, "cache")

    cfg = get_preset("timepooled-v1")
    tree, _ = ckpt_io.load_checkpoint(ckpt)
    params, state = tree["params"], tree["model_state"]
    stats = stats_from_fold(cache, 1)

    t0 = time.time()
    artifact = export_serving(
        cfg, params, state, norm_stats=stats, preset="timepooled-v1"
    )
    path = os.path.join(work, "model.sedart")
    artifact.save(path)
    export_sec = time.time() - t0

    loaded = ServingArtifact.load(path)
    feat = cfg.model.n_mels * cfg.model.in_channels
    rng = np.random.default_rng(0)
    raw = rng.standard_normal((64, cfg.model.seq_len_in, feat)).astype(
        np.float32
    )

    # Parity: exported program (TPU) vs live model on identical inputs.
    mean, scale = stats
    model = get_model(cfg.model)
    logits, _, _ = model.apply(
        params, state, ((raw - mean) / scale).astype(np.float32),
        Ctx(train=False),
    )
    want = np.asarray(jax.nn.sigmoid(logits))
    got = np.asarray(loaded.forward(raw))
    max_err = float(np.abs(got - want).max())

    # Latency: warm windowed forward (B=64) and streaming step. NOTE
    # block_until_ready lies under axon (docs/ROADMAP.md); materialize ONE
    # dependent scalar after the rep loop so the fetch waits for all reps.
    float(jnp_sum(loaded.forward(raw)))  # warm/compile + settle
    reps = 20
    t0 = time.time()
    acc = 0.0
    for _ in range(reps):
        acc = acc + jnp_sum(loaded.forward(raw))
    float(acc)
    fwd_ms = (time.time() - t0) / reps * 1e3

    carry = loaded.stream_init()
    chunk = raw[0]
    carry, probs = loaded.stream_step(carry, chunk)  # warm
    float(jnp_sum(probs))
    t0 = time.time()
    acc = 0.0
    for _ in range(reps):
        carry, probs = loaded.stream_step(carry, chunk)
        acc = acc + jnp_sum(probs)
    float(acc)
    step_ms = (time.time() - t0) / reps * 1e3

    line = {
        "stage": "export_check",
        "artifact_bytes": os.path.getsize(path),
        "platforms": loaded.meta["platforms"],
        "export_sec": round(export_sec, 1),
        "forward_max_abs_err": max_err,
        "fwd_b64_ms": round(fwd_ms, 3),
        "stream_step_ms": round(step_ms, 3),
        # CPU round-trips are bit-exact (tests/test_export.py); on the TPU
        # the exported StableHLO and the live jit schedule f32 contractions
        # differently (measured 8.7e-5 on sigmoid outputs), so the band here
        # is the same 2e-4 used for cross-implementation torch parity.
        "ok": bool(max_err < 2e-4),
    }
    print(json.dumps(line))
    return line


def multiseed_check(frames: int = 40_000, n_steps: int = 100,
                    chain: int = 3, preset: str = "timepooled-v1") -> dict:
    """Time the stacked multi-seed trainer on hardware: 4 concurrent v1 runs
    (bf16 trunk, the bench configuration) vs the single-run epoch — the
    protocol-level speedup of `train/multiseed.py` over 4x sequential.
    (Parameters exist so the CPU smoke run can shrink the workload.)"""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from sed_crnn_tpu.core.config import get_preset
    from sed_crnn_tpu.data.rasterize import rasterize_events
    from sed_crnn_tpu.models import get_model
    from sed_crnn_tpu.train.loop import Trainer, make_samplers
    from sed_crnn_tpu.train.multiseed import MultiSeedTrainer

    exp = get_preset(preset)
    exp = exp.replace(model=dataclasses.replace(exp.model, compute_dtype="bfloat16"))
    rng = np.random.default_rng(1)
    mel = rng.standard_normal((frames, 40)).astype(np.float32)
    events = [(t, t + 0.3) for t in np.arange(2.0, frames / 43.066 - 3, 2.0)]
    lab = rasterize_events(events, frames, 44100, 1024)
    fold = {"train_x": mel, "train_y": lab, "val_x": mel[:8000], "val_y": lab[:8000]}
    ts, vs = make_samplers(exp, fold)
    model = get_model(exp.model)
    n_seeds = 4

    def time_epochs(train_epoch, state, mk_keys):
        def run(seed0):
            nonlocal state
            scores = None
            for r in range(chain):
                state, scores = train_epoch(state, mk_keys(seed0 + r), n_steps)
            _ = float(jnp.sum(scores["loss"]))

        run(1)  # compile + warm
        times = []
        for r in range(3):
            t0 = time.time()
            run(10 + chain * r)
            times.append(time.time() - t0)
        return min(times) / chain

    single = Trainer(model, exp.train, ts, vs)
    dt1 = time_epochs(
        lambda s, k, n: single.train_epoch(s, k, n),
        single.init_state(jax.random.PRNGKey(0)),
        lambda s: jax.random.PRNGKey(s),
    )

    multi = MultiSeedTrainer(model, exp.train, ts, vs, n_seeds)
    stm = multi.init_states(
        jnp.stack([jax.random.PRNGKey(3 + i) for i in range(n_seeds)])
    )
    dtm = time_epochs(
        lambda s, k, n: multi.train_epoch(s, k, n), stm,
        lambda s: jnp.stack(
            [jax.random.PRNGKey(s + 97 * i) for i in range(n_seeds)]
        ),
    )

    line = {
        "stage": "multiseed_check",
        "single_epoch_ms": round(dt1 * 1e3, 1),
        "stacked4_epoch_ms": round(dtm * 1e3, 1),
        "aggregate_speedup_vs_sequential": round(n_seeds * dt1 / dtm, 2),
        "ok": bool(dtm < n_seeds * dt1),
    }
    print(json.dumps(line))
    return line


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--work-dir", default="/tmp/serving_demo")
    p.add_argument("--skip-binaural", action="store_true")
    p.add_argument("--binaural-epochs", type=int, default=50)
    p.add_argument("--protocol-runs", type=int, default=2,
                   help="extra stage: the 4-fold x N-runs protocol "
                        "(stacked multi-seed training) + member/ensemble "
                        "eval on fold 1 (0 = skip)")
    p.add_argument("--protocol-epochs", type=int, default=25)
    args = p.parse_args(argv)

    import jax

    print(json.dumps({"stage": "devices",
                      "devices": [str(d) for d in jax.devices()]}))

    import serving_demo

    rc_demo = serving_demo.main(["--work-dir", args.work_dir])
    print(json.dumps({"stage": "serving_demo_rc", "rc": rc_demo}))

    try:
        export_check(args.work_dir)
    except Exception as e:  # keep the batch going; report the failure
        print(json.dumps({"stage": "export_check", "error": repr(e)}))

    try:
        multiseed_check()
    except Exception as e:
        print(json.dumps({"stage": "multiseed_check", "error": repr(e)}))

    if not args.skip_binaural:
        import flagship_binaural

        rc_bin = flagship_binaural.main(
            ["--max-epochs", str(args.binaural_epochs)]
        )
        print(json.dumps({"stage": "flagship_binaural_rc", "rc": rc_bin}))

    if args.protocol_runs:
        import flagship_binaural

        rc_proto = flagship_binaural.main([
            "--max-epochs", str(args.protocol_epochs),
            "--runs", str(args.protocol_runs),
            "--art-dir", "/tmp/flagship_protocol",
        ])
        print(json.dumps({"stage": "flagship_protocol_rc", "rc": rc_proto}))

    print(json.dumps({"stage": "batch_done"}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
