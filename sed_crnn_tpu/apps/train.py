"""Training CLI — the reference's two trainer entry points unified.

  python -m sed_crnn_tpu.apps.train --preset timepooled-v2 --cache-dir DIR
  python -m sed_crnn_tpu.apps.train --preset sednet-dcase --cache-dir DIR --channel-tag mon
  python -m sed_crnn_tpu.apps.train --preset timepooled-v1 --synthetic  # smoke run

Replaces `python sed.py` / `python train_lightning.py` (edit-the-source
configuration) with flags; artifacts land under --art-dir/<timestamp>/fold<k>.
"""

from __future__ import annotations

import argparse
import dataclasses
import datetime
import os

import numpy as np

from sed_crnn_tpu.core.config import get_preset
from sed_crnn_tpu.data import store
from sed_crnn_tpu.train import loop as train_loop


def synthetic_folds(k: int = 2, frames: int = 8000, seed: int = 0,
                    n_classes: int = 1, n_mels: int = 40,
                    in_channels: int = 1):
    """Planted-signature folds matching a preset's label width: each class
    paints its own mel band so the model has something learnable. Binaural
    presets get channel-stacked features (the fold-pack layout,
    `data/seqs.py::split_multi_channels` contract)."""
    from sed_crnn_tpu.data.rasterize import rasterize_events

    rng = np.random.default_rng(seed)
    band = max(2, n_mels // max(n_classes, 1) // 2)

    def split(n):
        mel = rng.standard_normal((n, n_mels * in_channels)).astype(np.float32)
        events, cls_ids, t = [], [], 2.0
        while t * 43 < n - 100:
            events.append((t, t + rng.uniform(0.2, 0.5)))
            cls_ids.append(int(rng.integers(0, n_classes)))
            t += rng.uniform(2.0, 4.0)
        lab = rasterize_events(events, n, 44100, 1024, n_classes, cls_ids)
        for c in range(n_classes):
            lo = (c * band) % max(n_mels - band, 1)
            for ch in range(in_channels):
                off = ch * n_mels
                mel[lab[:, c] == 1, off + lo : off + lo + band] += 4.0
        return mel, lab

    folds = {}
    for f in range(1, k + 1):
        tr = split(frames)
        va = split(frames // 2)
        folds[f] = {
            "train_x": tr[0], "train_y": tr[1], "val_x": va[0], "val_y": va[1]
        }
    return folds


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--preset", default="timepooled-v1",
                   help="timepooled-v1 | timepooled-v2 | sednet-dcase[-binaural]")
    p.add_argument("--cache-dir", help="feature cache dir with mbe_*_fold*.npz")
    p.add_argument("--channel-tag", default="mon", help="mon | bin | binmul")
    p.add_argument("--art-dir", default="train_artifacts")
    p.add_argument("--folds", type=int, nargs="+", default=[1, 2, 3, 4])
    p.add_argument("--max-epochs", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--lr", type=float, default=None)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--plot-every", type=int, default=None)
    p.add_argument("--resume", action="store_true",
                   help="resume each fold from its last checkpoint if present")
    p.add_argument("--synthetic", action="store_true",
                   help="train on generated data (smoke/benchmark run)")
    p.add_argument("--data-parallel", type=int, default=0, metavar="N",
                   help="train data-parallel over N devices (0 = single device)")
    p.add_argument("--runs", type=int, default=1, metavar="N",
                   help="repeat the experiment over N seeds trained as one "
                        "stacked program and report mean±std ER/F1 (the "
                        "reference README's 'mean of 5 runs' protocol)")
    p.add_argument("--seed-parallel", type=int, default=0, metavar="N",
                   help="with --runs: shard the seed axis over N devices "
                        "(runs must divide evenly)")
    p.add_argument("--runs-mode", choices=("auto", "stacked", "sequential"),
                   default="auto",
                   help="with --runs: 'stacked' trains all repetitions as "
                        "one vmapped program (best for small models and "
                        "multi-chip meshes); 'sequential' runs them one at "
                        "a time (faster for conv-128 models on one chip — "
                        "stacking pushes the conv batch past the BatchNorm "
                        "fusion-split point). 'auto' (default) picks from "
                        "that measurement; an explicit losing choice warns")
    p.add_argument("--slow-prng", action="store_true",
                   help="keep jax's default threefry PRNG (default: TPU-native rbg)")
    args = p.parse_args(argv)

    from sed_crnn_tpu.core.runtime import configure

    configure(fast_prng=not args.slow_prng)

    cfg = get_preset(args.preset)
    overrides = {}
    if args.max_epochs is not None:
        overrides["max_epochs"] = args.max_epochs
    if args.batch_size is not None:
        overrides["batch_size"] = args.batch_size
    if args.lr is not None:
        overrides["learning_rate"] = args.lr
    if args.seed is not None:
        overrides["seed"] = args.seed
    if args.plot_every is not None:
        overrides["plot_every"] = args.plot_every
    if overrides:
        cfg = cfg.replace(train=dataclasses.replace(cfg.train, **overrides))

    if args.synthetic:
        # enough frames that even the sequence sampler fills one batch of
        # seq_len_in windows per epoch (sednet: 128 x 256-frame sequences)
        min_frames = int(cfg.train.batch_size * cfg.model.seq_len_in * 1.3)
        folds = {
            f: fd
            for f, fd in synthetic_folds(
                max(args.folds),
                frames=max(8000, min_frames),
                n_classes=cfg.model.n_classes,
                n_mels=cfg.model.n_mels,
                in_channels=cfg.model.in_channels,
            ).items()
            if f in args.folds
        }
    else:
        if not args.cache_dir:
            p.error("--cache-dir required unless --synthetic")
        folds = store.load_all_folds(args.cache_dir, args.folds, args.channel_tag)

    # --resume continues the most recent run under --art-dir (a fresh
    # timestamp directory would never contain the checkpoints to resume from)
    art_root = None
    if args.resume and os.path.isdir(args.art_dir):
        runs = sorted(
            d for d in os.listdir(args.art_dir)
            if os.path.isdir(os.path.join(args.art_dir, d))
        )
        if runs:
            art_root = os.path.join(args.art_dir, runs[-1])
            print(f"resuming run {art_root}")
    if art_root is None:
        art_root = os.path.join(
            args.art_dir, f"{datetime.datetime.now():%Y%m%d_%H%M%S}"
        )
    os.makedirs(art_root, exist_ok=True)
    print(f"ARTIFACTS -> {art_root}")

    if args.runs > 1:
        from sed_crnn_tpu.train import multiseed

        if args.resume:
            p.error("--resume with --runs: resume individual seeds via "
                    "run_fold(resume_from=<seed dir>/last_fold<k>.npz) instead")
        if args.data_parallel:
            p.error("--runs composes with --seed-parallel, not --data-parallel "
                    "(the seed axis is the cheaper multi-chip axis here)")
        mesh = None
        if args.seed_parallel:
            if args.runs_mode == "sequential":
                p.error("--seed-parallel shards the stacked seed axis; it "
                        "does not compose with --runs-mode sequential")
            from sed_crnn_tpu.parallel.mesh import make_mesh

            mesh = make_mesh(args.seed_parallel, axis_name="seed")
            print(f"seed-parallel over {args.seed_parallel} devices")
        multiseed.run_experiment_multiseed(
            cfg, folds, art_root, n_runs=args.runs, mesh=mesh,
            mode=args.runs_mode,
        )
        return

    trainer_factory = None
    if args.data_parallel:
        from sed_crnn_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(args.data_parallel)
        trainer_factory = train_loop.data_parallel_factory(mesh)
        print(f"data-parallel over {args.data_parallel} devices")

    if args.resume:
        results = []
        for fold_id, fold_data in sorted(folds.items()):
            fold_dir = os.path.join(art_root, f"fold{fold_id}")
            last = os.path.join(fold_dir, f"last_fold{fold_id}.npz")
            results.append(
                train_loop.run_fold(
                    cfg, fold_data, fold_id, fold_dir,
                    resume_from=last if os.path.exists(last) else None,
                    trainer_factory=trainer_factory,
                )
            )
        mean_er = float(np.mean([r.best_er for r in results]))
        print(f"average ER across folds: {mean_er:.3f}")
    else:
        train_loop.run_experiment(cfg, folds, art_root, trainer_factory=trainer_factory)


if __name__ == "__main__":
    main()
