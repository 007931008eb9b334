"""Binaural flagship workflow on real hardware, one process end to end.

Covers the two BASELINE staged configs that FLAGSHIP_RUN.md's mono run does
not: the multichannel (binaural) 4-fold cross-validation
(`/root/reference/README.md:62-65`, features stacked per channel via the
`split_multi_channels` contract, reference `utils.py:15-25`) and the jitted
full-split evaluation — threshold sweep + segment + event metrics — that the
reference has no entry point for.

Stages (all in ONE process, so the axon tunnel session cost is paid once):

  1. `apps.train --preset sednet-dcase-binaural --synthetic` — 4 folds x
     flagship-scale planted-signature binaural folds (80-wide feature rows =
     2 channels x 40 mels), full-width SEDnet, early stop on 1-sec ER.
  2. Regenerate the identical synthetic folds (same seed/shape path as
     `--synthetic`) and run `train/evaluate.py::evaluate_split` on fold 1's
     best checkpoint: full val split, 19-point threshold sweep, segment
     ER/F1, event-based ER/F1 under both 'optimal' and sed_eval-'greedy'
     matching.

Prints one JSON line per stage. Run on the TPU:

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/flagship_binaural.py
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--art-dir", default="/tmp/flagship_binaural")
    p.add_argument("--max-epochs", type=int, default=50)
    p.add_argument("--folds", type=int, nargs="+", default=[1, 2, 3, 4])
    p.add_argument("--runs", type=int, default=1,
                   help="train the full 'mean of N runs' protocol (all N "
                        "repetitions of each fold as one stacked program) "
                        "and evaluate fold 1's seed checkpoints as members "
                        "+ probability ensemble")
    p.add_argument("--batch-size", type=int, default=None,
                   help="override the preset batch size (CPU smoke runs)")
    p.add_argument("--preset", default="sednet-dcase-binaural",
                   help="flagship preset to run (sednet-dcase for the "
                        "mono protocol)")
    args = p.parse_args(argv)

    import jax

    from sed_crnn_tpu.apps import train as train_app
    from sed_crnn_tpu.core import checkpoint as ckpt_io
    from sed_crnn_tpu.core.config import get_preset
    from sed_crnn_tpu.models import get_model
    from sed_crnn_tpu.train.evaluate import evaluate_split

    print(json.dumps({"stage": "devices",
                      "devices": [str(d) for d in jax.devices()]}))

    preset = args.preset
    t0 = time.time()
    train_argv = [
        "--preset", preset, "--synthetic",
        "--folds", *[str(f) for f in args.folds],
        "--max-epochs", str(args.max_epochs),
        "--plot-every", "10", "--art-dir", args.art_dir,
    ]
    if args.runs > 1:
        train_argv += ["--runs", str(args.runs)]
    if args.batch_size is not None:
        train_argv += ["--batch-size", str(args.batch_size)]
    train_app.main(train_argv)
    train_sec = time.time() - t0

    run_dir = os.path.join(
        args.art_dir, sorted(os.listdir(args.art_dir))[-1]
    )
    summary_name = (
        "experiment_multiseed.jsonl" if args.runs > 1 else "experiment.jsonl"
    )
    with open(os.path.join(run_dir, summary_name)) as f:
        summary = [json.loads(ln) for ln in f if ln.strip()][-1]
    print(json.dumps({"stage": "train", "preset": preset,
                      "folds": args.folds, "max_epochs": args.max_epochs,
                      "runs": args.runs,
                      "wall_sec": round(train_sec, 1), **summary}))

    # Stage 2: jitted full-split eval on fold 1's best checkpoint, over the
    # SAME synthetic folds --synthetic trained on (deterministic: seed 0).
    cfg = get_preset(preset)
    if args.batch_size is not None:
        import dataclasses

        cfg = cfg.replace(
            train=dataclasses.replace(cfg.train, batch_size=args.batch_size)
        )
    min_frames = int(cfg.train.batch_size * cfg.model.seq_len_in * 1.3)
    folds = train_app.synthetic_folds(
        max(args.folds), frames=max(8000, min_frames),
        n_classes=cfg.model.n_classes, n_mels=cfg.model.n_mels,
        in_channels=cfg.model.in_channels,
    )
    fold1 = folds[1]
    model = get_model(cfg.model)

    if args.runs > 1:
        # Per-seed members + the probability ensemble on fold 1's val split
        # (the evaluate CLI's multi-checkpoint surface, driven on hardware).
        import glob

        from sed_crnn_tpu.train.evaluate import stack_trees

        ckpts = sorted(glob.glob(
            os.path.join(run_dir, "fold1", "seed*", "best_fold1.npz")
        ))
        loaded = [ckpt_io.load_checkpoint(c) for c in ckpts]
        ers, f1s = [], []
        for path, (tree, _) in zip(ckpts, loaded):
            r = evaluate_split(
                model, tree["params"], tree["model_state"],
                fold1["val_x"], fold1["val_y"], cfg,
            )
            ers.append(r["er_1s"])
            f1s.append(r["f1_1s"])
        t0 = time.time()
        ens = evaluate_split(
            model,
            stack_trees([t["params"] for t, _ in loaded]),
            stack_trees([t["model_state"] for t, _ in loaded]),
            fold1["val_x"], fold1["val_y"], cfg, ensemble=True,
        )
        print(json.dumps({
            "stage": "evaluate_ensemble", "fold": 1, "split": "val",
            "n_members": len(ckpts),
            "member_er_1s": [round(v, 4) for v in ers],
            "member_mean_er_1s": round(float(np.mean(ers)), 4),
            "member_std_er_1s": round(float(np.std(ers)), 4),
            "ensemble_er_1s": round(ens["er_1s"], 4),
            "ensemble_f1_1s": round(ens["f1_1s"], 4),
            "ensemble_best_er_1s": round(ens["best_er_1s"], 4),
            "wall_sec": round(time.time() - t0, 1),
        }))
        print(json.dumps({"stage": "done", "run_dir": run_dir}))
        return 0

    ckpt = os.path.join(run_dir, "fold1", "best_fold1.npz")
    tree, meta = ckpt_io.load_checkpoint(ckpt)

    for matching in ("optimal", "greedy"):
        t0 = time.time()
        report = evaluate_split(
            model, tree["params"], tree["model_state"],
            fold1["val_x"], fold1["val_y"], cfg,
            event_matching=matching,
        )
        line = {
            "stage": "evaluate", "fold": 1, "split": "val",
            "checkpoint_epoch": meta.get("epoch"),
            "event_matching": matching,
            "wall_sec": round(time.time() - t0, 1),
            "n_windows": report["n_windows"],
            "er_1s": round(report["er_1s"], 4),
            "f1_1s": round(report["f1_1s"], 4),
            "best_threshold": report["best_threshold"],
            "best_er_1s": round(report["best_er_1s"], 4),
            "er_event": round(report["er_event"], 4),
            "f1_event": round(report["f1_event"], 4),
        }
        print(json.dumps(line))

    print(json.dumps({"stage": "done", "run_dir": run_dir}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
