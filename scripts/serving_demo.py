"""End-to-end serving demo on real hardware: wav files in, events JSON out.

Exercises the complete user journey the reference only partially supports
(it has no inference entry point at all, `/root/reference/README.md`):

  1. synthesize a Decorte-layout corpus (wav clips + hits.csv) with planted
     3 kHz burst events,
  2. `apps.feature`  — fused-Pallas log-mel extraction + fold packing
     (recording train-split norm stats in the packs),
  3. `apps.train`    — the full-width TimePooledCRNN v1 on fold 1,
  4. `apps.infer`    — streaming lookahead inference over a HELD-OUT long
     recording (never seen by training, 4x the training clip length),
  5. score the emitted events against the planted ground truth with the
     event-based collar metrics (`ops/event_metrics.py`).

Prints one JSON line per stage and a final summary. Run on the TPU:

  python scripts/serving_demo.py --work-dir /tmp/serving_demo
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import time

import numpy as np

from sed_crnn_tpu.data import wavio

SR = 44100
CLIP_SECONDS = 30
N_CLIPS = 12
HELDOUT_SECONDS = 120
BURST_HZ = 3000.0
BURST_LEN = 0.3


def _clip_with_bursts(rng, seconds):
    """Noise background with 3 kHz bursts planted at >=2 s spacing."""
    n = SR * seconds
    x = 0.01 * rng.standard_normal(n).astype(np.float32)
    events, t = [], 1.5
    while t < seconds - 2.0:
        a = int(t * SR)
        b = a + int(BURST_LEN * SR)
        tt = np.arange(b - a) / SR
        x[a:b] += (0.6 * np.sin(2 * np.pi * BURST_HZ * tt)).astype(np.float32)
        events.append((round(t, 3), round(t + BURST_LEN, 3)))
        t += float(rng.uniform(2.0, 4.5))
    return x, events


def make_corpus(work: str, seed: int):
    rng = np.random.default_rng(seed)
    media = os.path.join(work, "media")
    os.makedirs(media, exist_ok=True)
    rows = ["filename,start,end"]
    total_events = 0
    for i in range(N_CLIPS):
        x, events = _clip_with_bursts(rng, CLIP_SECONDS)
        name = f"clip{i:02d}.wav"
        wavio.write_wav(os.path.join(media, name), x, SR)
        rows += [f"{name},{s},{e}" for s, e in events]
        total_events += len(events)
    hits = os.path.join(work, "hits.csv")
    with open(hits, "w") as f:
        f.write("\n".join(rows) + "\n")

    x, heldout_events = _clip_with_bursts(rng, HELDOUT_SECONDS)
    heldout = os.path.join(work, "heldout.wav")
    wavio.write_wav(heldout, x, SR)
    return media, hits, heldout, heldout_events, total_events


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--work-dir", default="/tmp/serving_demo")
    p.add_argument("--preset", default="timepooled-v1")
    p.add_argument("--max-epochs", type=int, default=30)
    p.add_argument("--seed", type=int, default=7)
    p.add_argument("--backend", default="pallas",
                   help="frontend backend for feature extraction "
                        "(pallas on TPU; fft for CPU smoke runs)")
    args = p.parse_args(argv)

    from sed_crnn_tpu.apps import feature as feature_app
    from sed_crnn_tpu.apps import infer as infer_app
    from sed_crnn_tpu.apps import train as train_app
    from sed_crnn_tpu.ops.event_metrics import event_scores

    work = args.work_dir
    if os.path.isdir(work):
        shutil.rmtree(work)
    os.makedirs(work)

    t0 = time.time()
    media, hits, heldout, heldout_events, n_train_events = make_corpus(
        work, args.seed
    )
    stage = {"stage": "corpus", "clips": N_CLIPS, "clip_seconds": CLIP_SECONDS,
             "train_events": n_train_events,
             "heldout_seconds": HELDOUT_SECONDS,
             "heldout_events": len(heldout_events),
             "sec": round(time.time() - t0, 1)}
    print(json.dumps(stage))

    t0 = time.time()
    cache = os.path.join(work, "cache")
    feature_app.main(["--media-dir", media, "--hits-csv", hits,
                      "--cache-dir", cache, "--backend", args.backend])
    print(json.dumps({"stage": "feature", "backend": args.backend,
                      "audio_seconds": N_CLIPS * CLIP_SECONDS,
                      "sec": round(time.time() - t0, 1)}))

    t0 = time.time()
    art = os.path.join(work, "art")
    train_app.main(["--preset", args.preset, "--cache-dir", cache,
                    "--art-dir", art, "--folds", "1",
                    "--max-epochs", str(args.max_epochs), "--plot-every", "0"])
    run_dir = sorted(os.listdir(art))[-1]
    ckpt = os.path.join(art, run_dir, "fold1", "best_fold1.npz")
    hist = os.path.join(art, run_dir, "fold1", "train_fold1.jsonl")
    with open(hist) as f:
        last = json.loads(f.readlines()[-1])
    print(json.dumps({"stage": "train", "preset": args.preset,
                      "epochs": last["epoch"],
                      "final_val_er_1s": round(last["val"]["er_overall_1sec"], 3),
                      "sec": round(time.time() - t0, 1)}))

    t0 = time.time()
    out_json = os.path.join(work, "events.json")
    infer_app.main(["--wav", heldout, "--checkpoint", ckpt,
                    "--preset", args.preset, "--stats-from", cache,
                    "--lookahead", "--out", out_json])
    infer_sec = time.time() - t0
    with open(out_json) as f:
        payload = json.load(f)
    sys_events = [(ev["start_s"], ev["end_s"], ev["class"])
                  for ev in payload["events"]]
    ref_events = [(s, e, 0) for s, e in heldout_events]

    # the v1 head emits one frame per 8 x 1024 samples = 0.186 s; a 0.25 s
    # onset collar grants the scorer one output frame of quantization.
    scores = event_scores(ref_events, sys_events, t_collar=0.25)
    summary = {
        "stage": "infer+score",
        "heldout_audio_sec": HELDOUT_SECONDS,
        "infer_sec": round(infer_sec, 1),
        "ref_events": len(ref_events),
        "sys_events": len(sys_events),
        "event_f1": round(scores["f1_event"], 3),
        "event_er": round(scores["er_event"], 3),
    }
    print(json.dumps(summary))
    ok = scores["f1_event"] >= 0.8
    print(json.dumps({"stage": "verdict", "ok": bool(ok)}))
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
