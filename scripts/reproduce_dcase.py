"""One-command reproduction of the reference's headline DCASE numbers.

The reference's published table (`/root/reference/README.md:60-67`) is the
1-second segment ER/F1 of SEDnet on DCASE 2017 Task 3 (street scene),
4-fold cross-validation, mean of 5 runs: ER 0.60 / F1 0.57 single-channel,
ER 0.60 / F1 0.59 binaural. This driver runs that exact protocol end to end
on a local copy of the corpus (TUT Sound Events 2017, development set) and
prints the comparison — the only missing input in this environment is the
corpus itself (zero egress; see docs/ROADMAP.md "Real-dataset validation").

  python scripts/reproduce_dcase.py --dcase-root TUT-sound-events-2017-development
  python scripts/reproduce_dcase.py --dcase-root ... --binaural --runs 5

Stages: (1) feature extraction (skips per-file work already cached),
(2) 4-fold x N-seed training as stacked multi-seed programs,
(3) the protocol report vs the published baseline, as one JSON line.
`--smoke` shrinks the model/sequences for a fast correctness pass on a
synthetic miniature corpus (what `tests/test_reproduce_dcase.py` runs).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os

import numpy as np

BASELINES = {  # /root/reference/README.md:62-65
    "mon": {"er": 0.60, "f1": 0.57},
    "bin": {"er": 0.60, "f1": 0.59},
}


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dcase-root", required=True,
                   help="dataset root (audio/<scene>/ + evaluation_setup/)")
    p.add_argument("--cache-dir", default=None,
                   help="feature cache (default <dcase-root>/sedtpu_cache)")
    p.add_argument("--art-dir", default="reproduce_dcase_art")
    p.add_argument("--scene", default="street")
    p.add_argument("--binaural", action="store_true")
    p.add_argument("--preset", default=None,
                   help="default sednet-dcase[-binaural]")
    p.add_argument("--runs", type=int, default=5,
                   help="seeds in the mean-of-N protocol (README uses 5)")
    p.add_argument("--folds", type=int, nargs="+", default=[1, 2, 3, 4])
    p.add_argument("--max-epochs", type=int, default=200)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--seed-parallel", type=int, default=0,
                   help="shard the seed axis over N mesh devices")
    p.add_argument("--smoke", action="store_true",
                   help="shrunken model + 64-frame sequences (CI-sized)")
    p.add_argument("--out", help="also write the report JSON here")
    args = p.parse_args(argv)

    from sed_crnn_tpu.apps import feature as feature_app
    from sed_crnn_tpu.core.config import get_preset
    from sed_crnn_tpu.data import store
    from sed_crnn_tpu.train import multiseed
    from sed_crnn_tpu.train import loop as train_loop

    tag = "bin" if args.binaural else "mon"
    preset = args.preset or (
        "sednet-dcase-binaural" if args.binaural else "sednet-dcase"
    )
    cache = args.cache_dir or os.path.join(args.dcase_root, "sedtpu_cache")

    # -- stage 1: features (per-file cache makes reruns cheap) -------------
    feat_args = [
        "--dcase-root", args.dcase_root, "--cache-dir", cache,
        "--scene", args.scene, "--folds", *map(str, args.folds),
    ]
    if args.binaural:
        feat_args.append("--binaural")
    feature_app.main(feat_args)

    # -- stage 2: the 4-fold x N-seed protocol ------------------------------
    cfg = get_preset(preset)
    if args.smoke:
        cfg = cfg.replace(
            model=dataclasses.replace(
                cfg.model, conv_channels=(8, 8, 8), gru_hidden=(4, 4),
                seq_len_in=64,
            )
        )
    tcfg = dict(cfg.train.__dict__)
    tcfg["max_epochs"] = args.max_epochs
    if args.batch_size:
        tcfg["batch_size"] = args.batch_size
    cfg = cfg.replace(train=cfg.train.__class__(**tcfg))

    folds = store.load_all_folds(cache, args.folds, tag)
    os.makedirs(args.art_dir, exist_ok=True)
    mesh = None
    if args.seed_parallel:
        from sed_crnn_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(args.seed_parallel, axis_name="seed")
    if args.runs > 1:
        out = multiseed.run_experiment_multiseed(
            cfg, folds, args.art_dir, n_runs=args.runs, mesh=mesh
        )
        er, f1 = out["mean_er"], out["mean_f1"]
        std_er, std_f1 = out["std_er"], out["std_f1"]
    else:
        out = train_loop.run_experiment(cfg, folds, args.art_dir)
        er, f1 = out["mean_er"], out["mean_f1"]
        std_er = std_f1 = 0.0

    # -- stage 3: the comparison -------------------------------------------
    base = BASELINES[tag]
    report = {
        "protocol": f"{len(args.folds)}-fold x {args.runs}-seed, {preset}",
        "channel": "binaural" if args.binaural else "single",
        "er_1s": round(er, 4),
        "f1_1s": round(f1, 4),
        "std_er": round(std_er, 4),
        "std_f1": round(std_f1, 4),
        "baseline_er": base["er"],
        "baseline_f1": base["f1"],
        "delta_er": round(er - base["er"], 4),
        "delta_f1": round(f1 - base["f1"], 4),
        "smoke": bool(args.smoke),
    }
    line = json.dumps(report)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")
    if not args.smoke:
        verdict = "MATCHES/BEATS" if (
            er <= base["er"] + 0.02 and f1 >= base["f1"] - 0.02
        ) else "BEHIND"
        print(f"vs published baseline: {verdict} "
              f"(ER {er:.3f} vs {base['er']}, F1 {f1:.3f} vs {base['f1']})")
    return report


if __name__ == "__main__":
    main()
